package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse tables: co-locate join/aggregation keys at WRITE
  * time so repeated equi-joins and group-bys on the key plan with no
  * exchange at READ time.
  *
  * This is the at-scale complement to `PartitionedStore`: hive `date=`
  * partitioning prunes WHICH files a query reads; bucketing fixes HOW
  * rows are distributed across those files (hash(key) mod buckets, one
  * output-file set per bucket). Two tables bucketed the same way
  * (same key, same bucket count) join with zero shuffle on either side —
  * at 100 TB that deletes the dominant cost of a fact-to-fact join, and
  * a sorted bucket (`sortBy`) upgrades it to a merge join with no sort
  * either. The price is paid once at write: `bucketBy` requires
  * `saveAsTable` (bucket metadata lives in the catalog), and each writer
  * task splits its rows across bucket files.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key. With both
    * sides bucketed (same count) the planner reuses the write-time hash
    * distribution: no Exchange on either side (plan-asserted in
    * `BucketingSpec`). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
