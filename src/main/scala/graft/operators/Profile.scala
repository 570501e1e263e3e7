package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Deequ-style column profiling: one pass over a table producing, per
  * column, its null count, exact distinct count, and typed min/max — the
  * data-quality summary a pipeline computes before trusting a new corpus
  * drop (SURVEY.md §5: the reference's dbt `not_null` test is the 1-column
  * special case of this).
  *
  * Shape: ALL per-column aggregates run in ONE `agg` (a single scan; the
  * multiple DISTINCT aggregates plan through Spark's Expand operator),
  * then the 1-row wide result is unpivoted with `stack` into one row per
  * column — no per-column jobs, no driver loop over data. At 100 TB the
  * exact `countDistinct` is the one knob to revisit: swap in
  * `approx_count_distinct` (the `Sketches` HLL path) per column when ±2%
  * is acceptable; everything else is partial-aggregatable min/max/count.
  *
  * Numeric and timestamp min/max surface as doubles (timestamps as epoch
  * seconds — engine-exact for whole-second data); string min/max surface
  * as strings. Doubles are never string-formatted (Spark and SQL engines
  * disagree on double→string rendering, not on the doubles themselves).
  */
object Profile {

  def columnProfile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    def isNumeric(dt: DataType) = dt.isInstanceOf[NumericType]
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val (minNum, maxNum) = f.dataType match {
        case dt if isNumeric(dt) =>
          (min(c).cast("double"), max(c).cast("double"))
        // parquet timestamps without tz surface as NTZ; route through the
        // session-UTC instant so epoch seconds match the oracle's epoch()
        case TimestampType | TimestampNTZType =>
          (min(c).cast("timestamp").cast("double"),
            max(c).cast("timestamp").cast("double"))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minStr, maxStr) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      Seq(
        (count(lit(1)) - count(c)).as(s"nn_${f.name}"),
        countDistinct(c).as(s"nd_${f.name}"),
        minNum.as(s"mn_${f.name}"), maxNum.as(s"mx_${f.name}"),
        minStr.as(s"ms_${f.name}"), maxStr.as(s"xs_${f.name}"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = fields.map(f =>
      s"'${f.name}', nn_${f.name}, nd_${f.name}, " +
        s"mn_${f.name}, mx_${f.name}, ms_${f.name}, xs_${f.name}")
      .mkString(", ")
    row.select(col("n_rows"), expr(
      s"stack(${fields.length}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"))
      .orderBy("col_name")
  }

  /** Contract query: the profile of the widest mixed-type table. */
  def profileLineitem(s: SparkSession, dir: String): DataFrame =
    columnProfile(Tables.load(s, dir, "lineitem"))
}
