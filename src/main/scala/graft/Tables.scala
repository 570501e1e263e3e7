package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * At 100 TB these would be hive-partitioned / bucketed catalog tables; the
  * loader keeps the access path behind one function so the physical layout
  * can change without touching any operator. All operators take the table
  * directory as a parameter (the driver contract passes `sfDir`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts arrives in whatever parquet annotation the generator used:
    // TIMESTAMP(NANOS) (Spark 4 refuses outright, [PARQUET_TYPE_ILLEGAL] —
    // read nanos as long, truncate to µs) or µs-precision without a
    // timezone (Spark 4 infers TIMESTAMP_NTZ). Either way normalize to the
    // session-local TIMESTAMP every operator and the streaming layer
    // expect; the session timezone is pinned to UTC repo-wide, so the NTZ
    // wall clock and the instant coincide exactly with what the DuckDB
    // oracle sees in the same file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    } else df
  }

  /** Register every table as a temp view so `spark.sql` queries resolve by
    * bare name (the dbt-view-layer analog, SURVEY.md §2.10). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
