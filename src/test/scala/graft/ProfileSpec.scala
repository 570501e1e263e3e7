package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** Column-profile semantics on a frame with known nulls (the driver
  * corpus is null-free, so the oracle row exercises counts/min/max but
  * not the null path). */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: nulls, distincts, and typed min/max routing") {
    val df = Seq(
      (Some(1L), Some(2.5), Some("b")),
      (Some(1L), None, Some("a")),
      (None, Some(7.5), None),
      (Some(3L), Some(2.5), Some("c")))
      .toDF("k", "v", "s")
    val p = Profile.columnProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("k", "v", "s"))
    p.values.foreach(r => assert(r.getLong(1) === 4)) // n_rows
    val k = p("k")
    assert(k.getLong(2) === 1 && k.getLong(3) === 2) // nulls, distinct
    assert(k.getDouble(4) === 1.0 && k.getDouble(5) === 3.0)
    assert(k.isNullAt(6) && k.isNullAt(7)) // numeric col: no string min/max
    val v = p("v")
    assert(v.getLong(2) === 1 && v.getLong(3) === 2)
    assert(v.getDouble(4) === 2.5 && v.getDouble(5) === 7.5)
    val s = p("s")
    assert(s.getLong(2) === 1 && s.getLong(3) === 3)
    assert(s.isNullAt(4) && s.isNullAt(5)) // string col: no numeric min/max
    assert(s.getString(6) === "a" && s.getString(7) === "c")
  }

  test("profile: two scans (wide aggs + narrow distinct pairs), no Expand") {
    val df = Profile.profileLineitem(spark, TestSpark.sf)
    val scans = df.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if s.getClass.getSimpleName == "LogicalRelation" => s
    }
    // one scan feeds the stacked null/min/max aggregates, one feeds the
    // narrow (col_idx, hash) distinct pipeline — never per-column jobs
    assert(scans.length === 2, "profile must read the table exactly twice")
    // the perf contract: distincts must NOT plan through Expand (the
    // 17x null-padded-key blowup measured at 23-25 s on sf0.1 lineitem)
    assert(!df.queryExecution.executedPlan.toString.contains("Expand"),
      "multi-countDistinct Expand regressed into the profile plan")
    assert(df.count() === 11)
  }
}
