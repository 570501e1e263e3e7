package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num
import Relational.dsum

/** Third relational batch: sessionization, as-of (latest-before) lookup,
  * JSON column extraction, pivot, deterministic moment statistics, ordered
  * string aggregation, math/date scalar surfaces. All oracle-checked.
  *
  * Determinism notes: session boundaries compare integer microseconds
  * (unix_micros / epoch_us) so both engines see identical gaps; variance
  * and stddev are computed from exact decimal moments (sum, sum of
  * squares) with one IEEE division/sqrt at the end — identical on any
  * partitioning; string aggregation sorts before joining. */
object RelationalMore {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Binned interval join — the equality-key rendering of a range join.
    * Problem shape: count the events inside ±`windowSec` of each
    * incident (the 5 earliest 'error' events). The naive form is a
    * range-predicate join, which Spark can only plan as a broadcast
    * nested loop — O(|events| × |incidents|) compares and a scale
    * cliff the moment the probe side stops fitting in one pass. The
    * standard fix: bucket both sides by a bin at least as wide as the
    * window, explode each probe to its 3 adjacent bins, hash-join on
    * the BIN (equality key → partitioned, spillable, AQE-skew-safe),
    * then apply the exact range filter to the bin-matched pairs. Cost
    * falls to |matches within ±1 bin|, and the plan contains NO nested
    * loop (spec-asserted). Timestamps compare as floor-epoch-seconds —
    * identical integers in both engines. */
  def rangeJoinBinned(s: SparkSession, dir: String,
      windowSec: Long = 86400L, nIncidents: Int = 5): DataFrame = {
    val sec = col("ts").cast("long")
    val evts = t(s, dir, "events")
      .select(sec.as("sec"),
        floor(sec / windowSec).cast("long").as("bucket"))
    val bucketOf = floor(col("inc_sec") / windowSec).cast("long")
    val probes = t(s, dir, "events")
      .filter(col("event_type") === "error")
      .orderBy(col("ts"), col("event_id"))
      .limit(nIncidents)
      .select(col("event_id").as("inc_id"), sec.as("inc_sec"))
      .select(col("inc_id"), col("inc_sec"),
        explode(array(bucketOf - 1, bucketOf, bucketOf + 1)).as("bucket"))
    evts.join(probes, Seq("bucket"))
      .filter(abs(col("sec") - col("inc_sec")) <= windowSec)
      .groupBy(col("inc_id"))
      .agg(count(lit(1)).as("n_within"))
      .orderBy("inc_id")
  }

  /** Sessionization: a new session starts after a >30-minute gap per user
    * (lag + running sum of boundary flags — the standard two-window
    * pattern; one shuffle on user_id). */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) -
      lag(unix_micros(col("ts")), 1).over(byUser)
    val newSession = when(gapUs > 1800L * 1000000L, 1).otherwise(0)
    t(s, dir, "events")
      .withColumn("session_idx",
        sum(newSession).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy("user_id", "session_idx")
  }

  /** SCD type-2 history reconstruction — the warehouse pattern that
    * turns an append-only change log into versioned dimension rows with
    * validity intervals: consecutive events carrying the SAME value
    * collapse into one version (only CHANGES open a new one), each
    * version gets `[valid_from, valid_to)` from its first event and the
    * next version's start, and the open version is flagged current.
    * Here the tracked attribute is the user's event_type (the log
    * stand-in for any dimension attribute feed).
    *
    * Scale shape: the change-flag + running-sum pair and the
    * interval-closing lead all run in windows partitioned by user_id —
    * entity-bounded, never global — and the version collapse is one
    * aggregate on (user, version); one shuffle on user_id serves all
    * three (the sessionize plan class). */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(byUser)
    val chg = when(prev.isNull || col("event_type") =!= prev, 1)
      .otherwise(0)
    val versioned = t(s, dir, "events")
      .withColumn("version",
        sum(chg).over(byUser.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)).cast("int"))
    val byUserV = Window.partitionBy(col("user_id"))
      .orderBy(col("version"))
    versioned
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("event_type"), // constant per version
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byUserV))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("user_id", "version")
  }

  /** As-of lookup: each user's latest event at-or-before a cutoff
    * (row_number over desc time — the point-in-time join building block). */
  def asofLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      // session-TZ string cast, not Timestamp.valueOf (JVM-default-TZ trap)
      .filter(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  /** True two-sided AS-OF JOIN: each purchase event picks the latest click
    * by the same user at-or-before its timestamp (click attribution).
    *
    * Rendered scale-first as union + running window, NOT a range join:
    * tag both sides, sort each user's rows by (ts, side) — clicks before
    * purchases on ties, giving the inclusive `p.ts >= c.ts` semantics —
    * and carry the last non-null click id forward with an UNBOUNDED
    * PRECEDING `last(ignoreNulls)` frame. One shuffle on user_id, O(n)
    * per user; a naive inequality join explodes to O(clicks × purchases)
    * per user and a per-row subquery plans a cartesian range probe.
    * Clicks are pre-deduplicated to one row per (user, ts) — max
    * event_id — so ties are deterministic on both engines (DuckDB's ASOF
    * picks an arbitrary row among equal timestamps otherwise). */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts"), col("click_id"),
        lit(null).cast("long").as("event_id"), lit(0).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast("long").as("click_id"), col("event_id"),
        lit(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_click_id",
        last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("asof_click_id"))
      .orderBy("event_id")
  }

  /** JSON column extraction + aggregate over the extracted value
    * (`props` is a JSON string per event — get_json_object stays inside
    * codegen; integer sums are exact). */
  def propsJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"),
        sum(col("k").cast("long")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Pivot: day x event_type counts (explicit value list => stable
    * schema; conditional-aggregation equivalent in the oracle). */
  def pivotDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  /** Sample variance / stddev from exact decimal moments:
    * var = (sum(x^2) - sum(x)^2/n) / (n-1). The two sums are exact
    * (decimal), so the result is one deterministic IEEE expression —
    * reproducible on any cluster layout, unlike stddev_samp's running
    * reduction. */
  def statsAgg(s: SparkSession, dir: String): DataFrame = {
    val n = count(lit(1)).cast("double")
    val s1 = dsum(col("l_quantity"))
    val s2 = dsum(col("l_quantity") * col("l_quantity"))
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        Num.t6((s2 - s1 * s1 / n) / (n - lit(1.0))).as("var_qty"),
        Num.t6(sqrt((s2 - s1 * s1 / n) / (n - lit(1.0)))).as("std_qty"))
      .orderBy("l_returnflag")
  }

  /** Ordered string aggregation: distinct event types per day, sorted and
    * comma-joined (sort_array makes collect_set deterministic). */
  def listaggTypes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("day")
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
        .as("types"))
      .orderBy("day")

  /** Math scalar surface (per-row IEEE ops — exact cross-engine). */
  def scalarMath(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        // transcendental results rounded to 6: libm (DuckDB) and
        // java.lang.Math (Spark) may differ in the last ulp
        Num.t6(sqrt(col("l_quantity"))).as("sqrt_q"),
        Num.t6(pow(col("l_quantity"), 2.0)).as("pow_q"),
        Num.t6(log(col("l_extendedprice"))).as("ln_price"),
        Num.t6(exp(col("l_discount"))).as("exp_d"),
        ceil(col("l_tax") * 100).as("ceil_tax"),
        floor(col("l_tax") * 100).as("floor_tax"),
        Num.t2(col("l_extendedprice") / 3.0).as("round_third"))
      .orderBy("l_orderkey", "l_linenumber")

  /** SQL front-end surface: the same mart, queried through `spark.sql`
    * over the registered view layer (dbt-consumer shape, SURVEY.md §3.3 —
    * the view inlines and optimizes end-to-end). */
  def sqlMart(s: SparkSession, dir: String): DataFrame = {
    graft.models.Catalog.registerAll(s, dir)
    s.sql(
      """SELECT day, n_events, sum_value FROM mart_daily_events
        | ORDER BY day DESC LIMIT 7""".stripMargin)
  }

  /** Order-count distribution (TPC-H Q13 shape): outer join, aggregate,
    * then aggregate the aggregate — two shuffles, both tiny after the
    * first partial. */
  def custDist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("n_orders").desc)

  /** Window frame functions: first/last value over a running frame,
    * ntile, percent_rank, cume_dist (all rank-derived => deterministic
    * doubles). */
  def winFrames(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    val framed = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        first(col("s_suppkey")).over(framed).as("richest"),
        last(col("s_suppkey")).over(framed).as("cur"),
        ntile(4).over(w).as("quartile"),
        Num.t6(percent_rank().over(w)).as("prank"),
        Num.t6(cume_dist().over(w)).as("cdist"))
      .orderBy("s_nationkey", "s_suppkey")
  }

  /** Multi-key sort with mixed directions and explicit null placement. */
  def multiSort(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc,
        col("o_orderkey").asc)

  /** Regex scalar surface: extract, match, global replace, split-count. */
  def regexFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "^(\\w+)", 1).as("first_word"),
        col("text").rlike("spark").as("mentions_spark"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long")
          .as("no_vowel_len"),
        size(split(col("text"), "a")).cast("long").as("a_splits"))
      .orderBy("doc_id")

  /** Z-score outlier detection per event type — the distribution-shift /
    * data-quality tripwire a pipeline runs on every new drop. Mean and
    * sample-std come from exact decimal moments (one aggregate keyed on
    * the handful of types, broadcast back), so the z each engine computes
    * is the identical IEEE double and the |z| > threshold decision can
    * never diverge; reported scores floor-truncated. Narrow scan + one
    * tiny broadcast join at any scale. */
  def valueOutliers(s: SparkSession, dir: String,
      zThreshold: Double = 3.0): DataFrame = {
    val n = count(lit(1)).cast("double")
    val s1 = dsum(col("value"))
    val s2 = dsum(col("value") * col("value"))
    val stats = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_grp"),
        (s1 / n).as("mean"),
        sqrt((s2 - s1 * s1 / n) / (n - lit(1.0))).as("std"))
      // degenerate groups would make z NaN/Inf (a single row gives
      // n-1 = 0; a constant group gives std = 0), and NaN compares
      // GREATER than any threshold in both Spark and DuckDB — every row
      // of such a group would be "an outlier" with z = NaN. No z-score
      // is defined there, so the group is excluded, matching the oracle.
      .filter(col("n_grp") >= 2 && col("std") > 0.0)
    val z = (col("value") - col("mean")) / col("std")
    t(s, dir, "events")
      .join(broadcast(stats), Seq("event_type"))
      .filter(abs(z) > zThreshold)
      .select(col("event_id"), col("event_type"), col("value"),
        Num.t6(z).as("z"))
      .orderBy("event_id")
  }

  /** Retention cohorts — the product-analytics staple: users grouped by
    * first-active day, distinct-user counts per (cohort, day offset).
    * Two shuffles, both keyed on user_id (the daily-activity distinct
    * and the cohort join); per-day counts then aggregate on the tiny
    * (cohort, offset) space. At 100 TB the activity distinct is the cost
    * center and is exactly the shape AQE/partial aggregation handles —
    * nothing here is per-user driver state. */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val acts = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val cohorts = acts.groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort"))
    acts.join(cohorts, Seq("user_id"))
      .select(col("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("day_offset"),
        col("user_id"))
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** Ordered conversion funnel view -> click -> purchase: each step's
    * timestamp must follow the previous step's (min-qualifying-ts chain,
    * so a purchase BEFORE the first qualifying click does not count).
    * Three monotonically-shrinking per-user aggregates, each one shuffle
    * keyed on user_id; the step tables broadcast as they shrink. */
  def funnelSteps(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, Seq("user_id"))
      .filter(col("ts") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id"))
      .filter(col("ts") >= col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    t1.agg(count(lit(1)).as("n_users"))
      .select(lit("step1_view").as("step"), col("n_users"))
      .unionByName(t2.agg(count(lit(1)).as("n_users"))
        .select(lit("step2_click").as("step"), col("n_users")))
      .unionByName(t3.agg(count(lit(1)).as("n_users"))
        .select(lit("step3_purchase").as("step"), col("n_users")))
      .orderBy("step")
  }

  /** Date arithmetic surface: interval add, day difference, month
    * boundaries, day-of-week. */
  def dateArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 2000)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("odate"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(lit(java.sql.Date.valueOf("1998-01-01")),
          to_date(col("o_orderdate"))).as("days_to_98"),
        add_months(to_date(col("o_orderdate")), 1).as("next_month"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        trunc(to_date(col("o_orderdate")), "month").as("month_start"),
        dayofweek(to_date(col("o_orderdate"))).as("dow"))
      .orderBy("o_orderkey")
}
