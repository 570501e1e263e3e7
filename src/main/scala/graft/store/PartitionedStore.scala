package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse layer: zstd Parquet, hive `date=` partition layout, and the
  * reference's idempotent per-day "upsert simples" — delete-then-insert of
  * one day inside a transaction (`weather_hourly_pipeline.py:101-112`) —
  * rendered Spark-native as dynamic partition overwrite.
  *
  * Layout matches the reference's S3 key scheme
  * `weather/date=YYYY-MM-DD/...` (`weather_hourly_pipeline.py:77`), so
  * partition pruning on a `date` predicate skips everything but the
  * touched day — the property that makes re-runs and backfills O(day),
  * not O(table), at 100 TB.
  */
object PartitionedStore {

  /** Write a batch, overwriting ONLY the calendar-day partitions present in
    * it (reference semantics: DELETE day + INSERT rows, U1 in SURVEY.md
    * §2.6). Re-running the same batch is a no-op state-wise (idempotent).
    *
    * Rows are sorted WITHIN each write task by (date, time): every
    * parquet file then carries monotone time ranges, so its row-group
    * min/max stats let readers with time predicates skip whole row
    * groups — the intra-file complement of `date=` partition pruning.
    * Free at write (a per-task sort of one day's rows), paid back on
    * every time-sliced read at 100 TB. */
  def upsertDaily(df: DataFrame, path: String, dateCol: String = "time"): Unit =
    dynamicOverwrite(df, path, dateCol, Nil)

  /** Keyed variant for UPDATE-mode streaming aggregates: partition by
    * `(date, keyCols...)` so the dynamic overwrite replaces exactly the
    * GROUPS present in the batch, never the whole day. An update-mode
    * micro-batch carries only the (day, key) groups it changed — each with
    * its full new aggregate value — so overwrite-at-group-granularity is
    * both correct and the minimal write. Overwriting at day granularity
    * instead would DELETE the day's untouched groups (the round-2 advisor
    * finding): an hourly batch containing only some event types for a day
    * silently dropped the rest.
    *
    * Key columns become hive partition directories; keep them
    * low-cardinality strings (e.g. `event_type`). */
  def upsertKeyed(df: DataFrame, path: String, dateCol: String,
      keyCols: Seq[String]): Unit =
    dynamicOverwrite(df, path, dateCol, keyCols)

  private def dynamicOverwrite(df: DataFrame, path: String, dateCol: String,
      keyCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      df.withColumn("date", to_date(col(dateCol)))
        .sortWithinPartitions(col("date"), col(dateCol))
        .write
        .mode("overwrite")
        .partitionBy("date" +: keyCols: _*)
        .option("compression", "zstd") // weather_hourly_pipeline.py:73
        .parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Read the warehouse back; hive partition discovery restores `date` as a
    * column and prunes on `date` predicates. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
