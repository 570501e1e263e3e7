package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num
import Relational.{dsum, davg}

/** The remaining TPC-H query shapes (Q2, Q9, Q11, Q16, Q17, Q20, Q21, Q22),
  * completing full 22-query coverage together with `Relational`
  * (Q1/3/4/5/6/7/8/10/12/14/15/18/19) and `RelationalMore` (Q13 custdist).
  *
  * The driver corpus has no `partsupp` table and no
  * `l_commitdate`/`l_receiptdate`/`c_phone`/`p_container` columns, so the
  * five queries that need them are ADAPTED SHAPES: the join/subquery
  * structure (the part the optimizer and the 100 TB plan care about) is
  * preserved, with documented stand-ins:
  *   - supply cost (Q2)      := min(l_extendedprice / l_quantity) per
  *                              (part, supplier), derived from lineitem;
  *   - part supply cost (Q9) := 10% of p_retailprice per unit;
  *   - stock value (Q11)     := shipped l_extendedprice per part;
  *   - complaint filter (Q16):= suppliers with negative account balance;
  *   - lateness (Q20/Q21)    := l_shipdate > o_orderdate + 90 days (the
  *                              same definition q12_late already uses);
  *   - country code (Q22)    := c_nationkey % 10 (phone prefix stand-in).
  *
  * Numerics follow the `Relational` discipline: every summed double goes
  * through exact DECIMAL(28,6) so results are bit-identical across engines
  * and partitionings; derived doubles that cross an output boundary are
  * floor-truncated (`Num.t6`) to stay tie-free.
  */
object RelationalTpch {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** TPC-H Q2 shape (minimum-cost supplier): for each SMALL part in a size
    * band, the AMERICA-region supplier(s) offering the lowest derived
    * supply cost. The correlated-MIN subquery is a window min over the
    * part key, computed AFTER the region/part filters so the window input
    * is already small; the supply relation itself is one lineitem
    * aggregate (shuffle on the composite part+supplier key — at 100 TB
    * this is the materialized-catalog build, done once and reusable). */
  def q2MinCost(s: SparkSession, dir: String): DataFrame = {
    val supply = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("supply_cost"))
    val regionSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
    val parts = t(s, dir, "part")
      .filter(col("p_size").between(10, 20) && col("p_type") === "SMALL")
      .select(col("p_partkey"), col("p_brand"))
    val w = Window.partitionBy(col("p_partkey"))
    supply
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      // supplier⋈nation⋈region is dim-sized at any SF, but after two joins
      // Spark's size estimate is unknown → would SMJ; broadcast explicitly
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_cost", min(col("supply_cost")).over(w))
      .filter(col("supply_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"),
        Num.t6(col("supply_cost")).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  /** TPC-H Q9 shape (product-type profit by nation and year): profit =
    * discounted revenue minus a 10%-of-retail unit-cost proxy, for one
    * part-name family. All three dims (filtered part, supplier, nation)
    * broadcast; the only shuffle join is the fact-to-fact
    * lineitem⋈orders on the order key. */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      lit(0.1) * col("p_retailprice") * col("l_quantity")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
        .filter(col("p_name").like("%widget"))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(dsum(profit).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (important stock): parts whose shipped value from
    * suppliers of one nation group exceeds 1.5x the mean part value — the
    * HAVING-with-scalar-subquery shape. The per-part aggregate is computed
    * once; its grand total re-aggregates those group rows (tiny input) and
    * broadcasts one row back, so lineitem is scanned exactly once. */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")
        .filter(col("s_nationkey") < 8).select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("ps_partkey"))
      .agg(dsum(col("l_extendedprice")).as("value"))
    // `value` is an exact multiple of 1e-6 (decimal-summed), so the re-cast
    // to decimal is lossless and the grand total stays order-independent.
    val mean = v.agg(davg(col("value")).as("mean_value"))
    v.crossJoin(broadcast(mean))
      .filter(col("value") > lit(1.5) * col("mean_value"))
      .select(col("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** TPC-H Q16 shape (part/supplier relationship count): distinct supplier
    * count per (brand, type, size) for a filtered part family, excluding
    * "complaint" suppliers (negative balance — the NOT IN subquery, planned
    * as a broadcast anti join so the exclusion never shuffles the fact). */
  def q16SupplierCount(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complaints = t(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): average yearly revenue
    * lost if orders below half a part's average quantity were dropped, for
    * one brand. The correlated AVG subquery is a per-part aggregate joined
    * back on the part key — one extra shuffle instead of one scan per part. */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val partAvg = t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pa_partkey"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
        .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("pa_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(Num.t6(dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q20 shape (suppliers with promotable stock): suppliers of one
    * nation group that shipped a bulk quantity (>45) of a `%widget` part
    * during 1997 — the nested IN-subquery chain, planned as part-filter
    * broadcast into lineitem, then a LEFT SEMI into supplier (each
    * supplier reported once regardless of qualifying shipment count). */
  def q20PromotableSuppliers(s: SparkSession, dir: String): DataFrame = {
    val widgetKeys = t(s, dir, "part")
      .filter(col("p_name").like("%widget")).select(col("p_partkey"))
    val bulkShippers = t(s, dir, "lineitem")
      .filter(col("l_quantity") > 45
        && col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(broadcast(widgetKeys), col("l_partkey") === col("p_partkey"))
      .select(col("l_suppkey"))
    t(s, dir, "supplier")
      .filter(col("s_nationkey") < 8)
      // the distinct bulk-shipper key set is bounded by |supplier| —
      // broadcast the semi side instead of shuffling the supplier table
      .join(broadcast(bulkShippers), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): for finalized
    * orders, count per supplier the late lines (shipped >90 days after
    * order date, the q12 lateness standin) where some OTHER supplier also
    * participated in the order but NO other supplier was late. The
    * EXISTS/NOT EXISTS pair plans as one LEFT SEMI + one LEFT ANTI on the
    * order key with a supplier-inequality residual — the late-line set is
    * derived once and reused as the anti side. */
  def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val finalized = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(finalized, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > date_add(col("o_orderdate"), 90))
      .select(col("l_orderkey"), col("l_suppkey"))
    val anyOther = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
    val lateOther = late
      .select(col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
    late
      .join(anyOther, col("l_orderkey") === col("o2_orderkey") &&
        col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(lateOther, col("l_orderkey") === col("o3_orderkey") &&
        col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q22 shape (global sales opportunity): well-funded customers
    * (balance above the positive-balance mean of their country-code group)
    * with no recent orders, counted per country code (nationkey % 10 —
    * the phone-prefix standin). Scalar subquery broadcast as a 1-row
    * aggregate; the "no recent orders" NOT EXISTS is a LEFT ANTI against
    * the date-filtered orders projection. */
  def q22Opportunity(s: SparkSession, dir: String): DataFrame = {
    val codes = Seq(1, 2, 3, 4, 5, 6, 7)
    val code = (col("c_nationkey") % 10).cast("int")
    val avgBal = t(s, dir, "customer")
      .filter(col("c_acctbal") > 0 && code.isin(codes: _*))
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    val recentOrders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey"))
    t(s, dir, "customer")
      .filter(code.isin(codes: _*))
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recentOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(code.as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }
}
