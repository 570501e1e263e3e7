package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, RelationalExt}

/** Cross-operator consistency checks (the value-level gate is the DuckDB
  * oracle; these pin relationships between operators). */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("semi + anti partition the customer table on the same order slice") {
    import org.apache.spark.sql.functions._
    // joinAnti filters orders to < 1996 (so it is non-vacuous at every
    // SF); the partition invariant must use the same slice on both sides.
    val semi = Tables.load(spark, TestSpark.sf, "customer")
      .join(
        Tables.load(spark, TestSpark.sf, "orders")
          .filter(col("o_orderdate") < lit("1996-01-01")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    val anti = RelationalExt.joinAnti(spark, TestSpark.sf).count()
    val all = Tables.load(spark, TestSpark.sf, "customer").count()
    assert(semi + anti === all)
    assert(anti > 0 && semi > 0) // both sides non-empty: the gate is real
  }

  test("set algebra: |union| = |A| + |B| - |intersect|") {
    val c = Tables.load(spark, TestSpark.sf, "customer")
      .select("c_nationkey").distinct().count()
    val s = Tables.load(spark, TestSpark.sf, "supplier")
      .select("s_nationkey").distinct().count()
    val u = RelationalExt.setUnion(spark, TestSpark.sf).count()
    val i = RelationalExt.setIntersect(spark, TestSpark.sf).count()
    assert(u === c + s - i)
  }

  test("rollup grand total equals table count") {
    val r = RelationalExt.rollupEvents(spark, TestSpark.sf).collect()
    val total = r.find(_.isNullAt(0)).get.getLong(1)
    assert(total === Tables.load(spark, TestSpark.sf, "events").count())
  }

  test("exact-decimal sum is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val a = li.agg(Relational.dsum(col("l_extendedprice"))).head().getDouble(0)
    val b = li.repartition(13).agg(Relational.dsum(col("l_extendedprice")))
      .head().getDouble(0)
    assert(a === b)
  }

  test("q1 plan: partial aggregation before the exchange") {
    val plan = Relational.q1Pricing(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("Exchange"))
  }
}
