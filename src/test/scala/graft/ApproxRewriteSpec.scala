package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ApproxRewrite

/** The flag-gated approximate-mode optimizer rule: no-op by default,
  * HLL++ rewrite of count(DISTINCT) when the session opts in. */
class ApproxRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withRule(f: => Unit): Unit = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ ApproxRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  private def planOf(): String = {
    val df = graft.operators.RelationalExt.distinctAgg(spark, TestSpark.sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("flag off (default): count(DISTINCT) stays exact") {
    withRule {
      assert(!planOf().contains("approx_count_distinct"))
    }
  }

  test("flag on: rewrites to HLL++ and stays within the rsd envelope") {
    val exact = graft.operators.RelationalExt.distinctAgg(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    withRule {
      spark.conf.set(ApproxRewrite.FlagKey, "true")
      try {
        val df = graft.operators.RelationalExt.distinctAgg(spark, TestSpark.sf)
        val rows = df.collect()
        assert(df.queryExecution.executedPlan.toString
          .contains("approx_count_distinct"))
        rows.foreach { r =>
          val (typ, approx) = (r.getString(0), r.getLong(1))
          val e = exact(typ).toDouble
          assert(math.abs(approx - e) / e < 0.05,
            s"$typ: approx $approx vs exact $e")
        }
        // plain count(*) in the same aggregate is untouched (exact)
        val nExact = graft.operators.RelationalExt
          .distinctAgg(spark, TestSpark.sf).collect()
          .map(r => r.getString(0) -> r.getLong(2)).toMap
        spark.conf.set(ApproxRewrite.FlagKey, "false")
        val nOff = graft.operators.RelationalExt
          .distinctAgg(spark, TestSpark.sf).collect()
          .map(r => r.getString(0) -> r.getLong(2)).toMap
        assert(nExact === nOff)
      } finally {
        spark.conf.set(ApproxRewrite.FlagKey, "false")
      }
    }
  }

  test("profile n_distinct rides the flag: HLL++ per column when on, " +
      "exact two-phase distinct (no Expand) when off") {
    val exactDf = graft.operators.Profile.profileLineitem(spark, TestSpark.sf)
    val exact = exactDf.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // default path: exact, no sketch, and still Expand-free (the 13x
    // r4 regression shape must not come back via the count_distinct form)
    val defPlan = exactDf.queryExecution.executedPlan.toString
    assert(!defPlan.contains("approx_count_distinct"))
    assert(!defPlan.contains("Expand"))
    withRule {
      spark.conf.set(ApproxRewrite.FlagKey, "true")
      try {
        val df = graft.operators.Profile.profileLineitem(spark, TestSpark.sf)
        val rows = df.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
        assert(df.queryExecution.executedPlan.toString
          .contains("approx_count_distinct"),
          "flag must flip the profile's n_distinct to HLL++")
        rows.foreach { case (c, approx) =>
          val e = exact(c).toDouble
          assert(e == 0.0 || math.abs(approx - e) / e < 0.05,
            s"$c: approx $approx vs exact $e")
        }
      } finally spark.conf.set(ApproxRewrite.FlagKey, "false")
    }
  }

  test("sql surface honors the flag too (rule sees every session query)") {
    withRule {
      spark.conf.set(ApproxRewrite.FlagKey, "true")
      try {
        graft.Tables.load(spark, TestSpark.sf, "events")
          .createOrReplaceTempView("ev_apx")
        val df = spark.sql(
          "SELECT count(DISTINCT user_id) AS u FROM ev_apx")
        df.collect()
        assert(df.queryExecution.executedPlan.toString
          .contains("approx_count_distinct"))
      } finally {
        spark.conf.set(ApproxRewrite.FlagKey, "false")
      }
    }
  }
}
