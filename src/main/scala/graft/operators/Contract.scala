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

  // ---- the rest of dbt's standard test set ----
  // (`not_null` above; `unique`, `relationships`, `accepted_values`,
  // and source `freshness` below — together the full schema-test
  // surface a dbt project declares in sources.yml / schema.yml.)

  /** dbt `unique` accounting for one declared-unique column: total rows,
    * distinct keys, rows participating in duplicate keys, and the
    * verdict. One groupBy on the key then a one-row re-aggregate — the
    * same two-phase shape per column at any scale (deliberately NOT a
    * multi-column countDistinct, which plans through Expand — the
    * profile_lineitem lesson). */
  def uniqueStats(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
          .as("n_dup_rows"),
        count(when(col("cnt") > 1, lit(1))).as("n_dup_keys"))
      .select(lit(c).as("col_name"), col("n_rows"), col("n_distinct"),
        col("n_dup_rows"), col("n_dup_keys"),
        (col("n_dup_rows") === 0).as("is_unique"))

  /** `unique` contract over `orders`: `o_orderkey` (declared unique —
    * must verify) next to `o_custkey` (a foreign key — measured, not
    * asserted), so the query demonstrates both verdicts in one relation,
    * mirroring [[eventNullContract]]'s pass+measure pattern. */
  def uniqueContract(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
    uniqueStats(orders, "o_orderkey")
      .unionByName(uniqueStats(orders, "o_custkey"))
      .orderBy("col_name")
  }

  /** dbt `relationships` accounting for one child→parent edge: child
    * rows, orphan rows (children whose key is absent from the parent),
    * verdict. NULL child keys are excluded from the orphan count before
    * the anti join — dbt's relationships test only checks non-null
    * children (a null FK is `not_null`'s business, and a null key never
    * matches an anti join anyway, which would silently count it as an
    * orphan). The orphan count is a LEFT ANTI join against the parent's
    * distinct keys — count-only projections on both sides, so the join
    * carries keys, never rows; at 100 TB the parent key set either
    * broadcasts (dimension) or the anti join shuffles on the key both
    * sides already aggregate on (fact). */
  def refIntStats(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, relName: String): DataFrame = {
    val nChild = child.agg(count(lit(1)).as("n_child"))
    val orphans = child.select(col(childKey))
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    nChild.crossJoin(orphans)
      .select(lit(relName).as("rel"), col("n_child"), col("n_orphans"),
        (col("n_orphans") === 0).as("ok"))
  }

  /** `relationships` contract over the two fact→dim edges every consumer
    * of this schema assumes: lineitem→orders and events→customer. */
  def refIntContract(s: SparkSession, dir: String): DataFrame =
    refIntStats(Tables.load(s, dir, "lineitem"), "l_orderkey",
      Tables.load(s, dir, "orders"), "o_orderkey",
      "lineitem.l_orderkey -> orders.o_orderkey")
      .unionByName(
        refIntStats(Tables.load(s, dir, "events"), "user_id",
          Tables.load(s, dir, "customer"), "c_custkey",
          "events.user_id -> customer.c_custkey"))
      .orderBy("rel")

  /** dbt `accepted_values` over `events.event_type`: per observed value,
    * its count and whether it is in the declared set. `error` is
    * deliberately NOT declared — the contract measures it as unexpected
    * (the alert a schema test raises when a producer adds a value), so
    * the relation shows accepted and violating rows side by side. One
    * groupBy on a handful of types; the accepted set is a literal array
    * in the expression tree. */
  def acceptedValuesContract(s: SparkSession, dir: String,
      accepted: Seq[String] = Seq("view", "click", "purchase", "signup"))
      : DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        array_contains(typedlit(accepted), col("event_type"))
          .as("is_accepted"))
      .orderBy("event_type")

  /** dbt source `freshness`: the newest event day against a fixed
    * reference date (the bundled corpus is static, so "now" is pinned —
    * a deployment passes current_date and the same plan runs). One
    * max-aggregate scan; warn/error thresholds are the standard dbt
    * freshness block rendered as booleans. */
  def freshnessContract(s: SparkSession, dir: String,
      asOf: String = "2024-02-05", warnAfterDays: Int = 7,
      errorAfterDays: Int = 30): DataFrame =
    Tables.load(s, dir, "events")
      .agg(max(to_date(col("ts"))).as("max_day"))
      .select(col("max_day"),
        datediff(to_date(lit(asOf)), col("max_day")).as("days_behind"))
      .select(col("max_day"), col("days_behind"),
        (col("days_behind") <= warnAfterDays).as("within_warn"),
        (col("days_behind") <= errorAfterDays).as("within_error"))
}
