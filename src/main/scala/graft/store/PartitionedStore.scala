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

  /** Schema-evolution gate — the S5 robustness family stated as an
    * oracle-checked boolean relation: a 100 TB lake's oldest files were
    * written before its newest columns existed, so every reader must
    * handle ADDED-COLUMN drift (the one evolution parquet merges
    * losslessly). The gate writes the documents projection twice — an
    * old batch WITHOUT `lang`, a new batch WITH it — reads both through
    * `mergeSchema`, and pins the read semantics downstream jobs rely
    * on:
    *  - `schema_widened`: the merged schema is exactly the union, new
    *    column last;
    *  - `old_rows_null_filled`: every pre-evolution row reads
    *    `lang IS NULL` (absence, not a default — filters and
    *    aggregates see exactly the rows that carried the value);
    *  - `new_rows_carry_values`: every post-evolution row keeps its
    *    written value;
    *  - `rows_conserved`: the merged read loses/duplicates nothing;
    *  - `pruned_read_agrees`: a projection that never touches the
    *    evolved column returns identical aggregates over old files
    *    with and without mergeSchema — evolution cannot tax readers
    *    that don't use the new column.
    *
    * Scale shape: bounded-lifecycle scratch write; at 100 TB the same
    * merge happens per-file at planning time from footer schemas (or
    * one catalog lookup when a table format records the evolution). */
  def schemaEvolutionGate(s: SparkSession, dir: String): DataFrame = {
    val scratch = graft.operators.Similarity.scratchDir(s, "graft-sevo-")
    try {
      val docs = graft.Tables.load(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val neu = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
      old.write.mode("overwrite").parquet(s"$scratch/old")
      neu.write.mode("overwrite").parquet(s"$scratch/new")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$scratch/old", s"$scratch/new")
      val m = merged.agg(
        count(lit(1)).as("total"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("nulls"),
        sum(when(col("doc_id") % 2 === 1 && col("lang").isNotNull, 1L)
          .otherwise(0L)).as("carried"),
        sum(col("n_chars")).as("chars")).head()
      val c = docs.agg(
        count(lit(1)).as("n"),
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("nOld"),
        sum(col("n_chars")).as("chars")).head()
      // the no-new-column projection must agree over the old files
      // whether or not schema merging is on
      val oldPlain = s.read.parquet(s"$scratch/old")
        .agg(sum(col("n_chars"))).head().getLong(0)
      val oldMerged = s.read.option("mergeSchema", "true")
        .parquet(s"$scratch/old")
        .agg(sum(col("n_chars"))).head().getLong(0)
      import s.implicits._
      Seq((merged.columns.toSeq ==
          Seq("doc_id", "source", "n_chars", "lang"),
        m.getLong(1) == c.getLong(1),
        m.getLong(2) == c.getLong(0) - c.getLong(1),
        m.getLong(0) == c.getLong(0) && m.getLong(3) == c.getLong(2),
        oldPlain == oldMerged))
        .toDF("schema_widened", "old_rows_null_filled",
          "new_rows_carry_values", "rows_conserved", "pruned_read_agrees")
    } finally graft.operators.Similarity.deleteScratch(scratch)
  }
}
