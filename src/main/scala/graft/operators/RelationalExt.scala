package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import Relational.{davg, dsum}

/** Extended relational coverage: outer/semi/anti/full joins, set
  * operations, window functions, rollup/cube, distinct aggregates, scalar
  * functions, and (de)correlated subquery shapes. SURVEY.md §2.5 records
  * the reference has none of these — Spark provides them natively; each is
  * exercised against the DuckDB oracle (SURVEY.md §7.2 step 4).
  *
  * Scale notes: semi/anti joins ship only the join keys of the probe side;
  * windows shuffle once on the partition key; set ops are shuffle-dedup
  * (union ALL is shuffle-free). The decimal-sum discipline from
  * [[Relational]] applies to every summed double.
  */
object RelationalExt {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** LEFT OUTER join preserving customers with zero orders. */
  def joinLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** LEFT SEMI join (EXISTS): customers with at least one order. Only the
    * key column of orders crosses the wire. */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** LEFT ANTI join (NOT EXISTS): customers with no 1995 orders. The
    * right side is filtered to a date slice so the result is non-empty at
    * every SF (every synthetic customer has *some* order — an unfiltered
    * anti-join returns 0 rows and verifies only the schema). */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").filter(col("o_orderdate") < lit("1996-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** FULL OUTER join of two aggregates: per-nation customer vs supplier
    * counts (aggregate-then-join keeps the outer join small). */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = t(s, dir, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  /** UNION (distinct) of customer and supplier nation keys. */
  def setUnion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  /** INTERSECT of the same key sets. */
  def setIntersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(
        t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** EXCEPT: nations with customers but no low-numbered supplier. The
    * supplier side is restricted to nations 0-14 so the difference is
    * non-empty at every SF (suppliers otherwise cover all 25 nations and
    * an empty EXCEPT verifies only the schema). */
  def setExcept(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(
        t(s, dir, "supplier").filter(col("s_nationkey") < 15)
          .select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** INTERSECT ALL (multiplicity-preserving). */
  def setIntersectAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersectAll(
        t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** EXCEPT ALL (multiplicity-preserving). */
  def setExceptAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .exceptAll(
        t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** Null-handling scalar surface: coalesce / nullif / ifnull / nvl2
    * shapes over a column with injected nulls. */
  def nullFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "O", null)
          .otherwise(col("o_orderstatus")).as("maybe_status"))
      .select(
        col("o_orderkey"),
        coalesce(col("maybe_status"), lit("OPEN")).as("status_or_open"),
        col("maybe_status").isNull.as("was_null"),
        nullif(col("o_orderkey") % 100, lit(0)).as("mod_or_null"))
      .orderBy("o_orderkey")

  /** UNION ALL (shuffle-free concatenation) of two tagged slices. */
  def unionAll(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    ev.filter(col("event_type") === "error")
      .select(lit("err").as("tag"), col("event_id"))
      .union(ev.filter(col("event_type") === "purchase")
        .select(lit("buy").as("tag"), col("event_id")))
      .orderBy("tag", "event_id")
  }

  /** COUNT(DISTINCT) per group (expand + two-phase aggregate). */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** GROUP BY ROLLUP: per-type + grand-total in one pass. */
  def rollupEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .rollup(col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(asc_nulls_first("event_type"))

  /** GROUP BY CUBE over two keys. */
  def cubeFlags(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  /** Running (prefix) sum per user — exact decimal, so the running value
    * is deterministic at any prefix. */
  def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(28, 6))).over(w)
          .cast(DoubleType).as("running"))
      .orderBy("event_id")
  }

  /** LAG delta per user (IEEE subtraction of two exact reads). */
  def winLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
      .orderBy("event_id")
  }

  /** RANK + DENSE_RANK of suppliers by balance within nation. */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc)
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .orderBy("s_nationkey", "rnk", "s_suppkey")
  }

  /** Scalar string/date function coverage (SURVEY.md §2.7 and beyond). */
  def scalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderstatus"), 1, 1).as("status1"),
        length(col("o_orderpriority")).as("prio_len"),
        concat(col("o_orderstatus"), lit("|"), col("o_orderpriority"))
          .as("tagged"))
      .orderBy("o_orderkey")

  /** CASE expression bucketing + aggregate. */
  def caseBuckets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("bucket"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("bucket")

  /** GROUP BY ... HAVING. */
  def havingBigCust(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 3)
      .orderBy("o_custkey")

  /** Scalar subquery: orders above the (deterministic) global average
    * price. The 1-row aggregate is broadcast, not collected. */
  def aboveAvg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val avgDf = o.agg(davg(col("o_totalprice")).as("avg_p"))
    o.crossJoin(broadcast(avgDf))
      .filter(col("o_totalprice") > col("avg_p"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Correlated-subquery shape, decorrelated as aggregate+join: customers
    * above their nation's average balance. */
  def aboveNationAvg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val na = c.groupBy(col("c_nationkey").as("nk"))
      .agg(davg(col("c_acctbal")).as("na_avg"))
    c.join(broadcast(na), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("na_avg"))
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }
}
