package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Source-contract / data-quality checks — the engine rendering of the
  * reference's only automated test: the dbt `not_null` assertion on
  * `weather_hourly.time` (`/root/reference/dbt/models/sources.yml:9-10`,
  * run via `dbt test`).
  *
  * Design: the check itself is one distributed aggregate —
  * `count(*) - count(col)` per column — a single scan with map-side
  * partial aggregation, no shuffle of row data, so it costs one pass
  * regardless of table size. `assertNotNull` turns a non-zero count into
  * a driver-side failure, which is exactly what `dbt test` does (query,
  * then fail the run if violations > 0).
  */
object Contract {

  /** One row of per-column null-violation counts (`null_<col>` columns).
    * `count(*) - count(col)` is the portable null-count idiom (count of a
    * column skips nulls in every SQL engine). */
  def nullViolationCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to check")
    val aggs = cols.map(c => (count(lit(1)) - count(col(c))).as(s"null_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** dbt `not_null` semantics: fail loudly if any checked column has null
    * rows. The error message carries the per-column counts so the failure
    * is actionable without a re-query. */
  def assertNotNull(df: DataFrame, cols: Seq[String]): Unit = {
    val row = nullViolationCounts(df, cols).head()
    val bad = cols.zipWithIndex
      .map { case (c, i) => c -> row.getLong(i) }
      .filter(_._2 > 0L)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "not_null contract violated: " +
          bad.map { case (c, n) => s"$c ($n null rows)" }.mkString(", "))
  }

  /** Contract query over the `events` source: null counts for the columns
    * a consumer relies on (the analog of declaring `not_null` on
    * `weather_hourly.time`). `value`/`props` are intentionally included —
    * they DO carry nulls in the synthetic data, so the query demonstrates
    * both a passing and a measuring contract in one row. */
  def eventNullContract(s: SparkSession, dir: String): DataFrame =
    nullViolationCounts(
      Tables.load(s, dir, "events"),
      Seq("event_id", "ts", "event_type", "user_id", "value", "props"))
}
