package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, RelationalExt, Similarity}

/** Physical-plan shape assertions: the plan we want at 100 TB, not just
  * the first one that passes. (SURVEY.md §4: pruning/pushdown/broadcast
  * come free from Catalyst ONLY if the query is written declaratively —
  * these tests pin that we didn't break that.) */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.toString
  }

  test("q1: column pruning — scan reads only the 7 needed lineitem columns") {
    val p = plan(Relational.q1Pricing(spark, TestSpark.sf))
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_orderkey") && !p.contains("l_suppkey") &&
      !p.contains("l_shipdate"), "scan should not read unused columns")
  }

  test("q5: tiny dims join via broadcast, no shuffle of nation/region") {
    val p = plan(Relational.q5Region(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("segment_revenue: dimension side broadcast at small SF") {
    val p = plan(Relational.segmentRevenue(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("broadcast"))
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    assert(plan(Relational.top5Days(spark, TestSpark.sf))
      .contains("TakeOrderedAndProject"))
    assert(plan(Relational.q3Shipping(spark, TestSpark.sf))
      .contains("TakeOrderedAndProject"))
    assert(plan(Similarity.bruteForceTopK(spark, TestSpark.sf))
      .contains("TakeOrderedAndProject"))
  }

  test("aggregates are two-phase (partial before the exchange)") {
    val p = plan(Relational.martDaily(spark, TestSpark.sf))
    // top-down print: final agg ... exchange ... partial agg (the sort's
    // own exchange may appear earlier — search from the final agg down)
    val firstAgg = p.indexOf("HashAggregate")
    val lastAgg = p.lastIndexOf("HashAggregate")
    val ex = p.indexOf("Exchange", firstAgg)
    assert(firstAgg >= 0 && lastAgg > firstAgg && ex > firstAgg && ex < lastAgg,
      "expected final agg -> exchange -> partial agg in printed plan")
  }

  test("day_slice: range predicate is pushed to the scan") {
    val p = plan(Relational.daySlice(spark, TestSpark.sf))
    // ts arrives as a raw ns long (see Tables.load), so the filter applies
    // post-conversion; the event_id/type/value pruning must still hold and
    // no shuffle may appear before the sort.
    assert(p.contains("ReadSchema"))
    assert(!p.contains("props"), "unused column must be pruned")
  }

  test("semi/anti joins stay semi/anti in the physical plan") {
    assert(plan(RelationalExt.joinSemi(spark, TestSpark.sf))
      .contains("LeftSemi"))
    assert(plan(RelationalExt.joinAnti(spark, TestSpark.sf))
      .contains("LeftAnti"))
  }

  test("whole-stage codegen covers the scan->project path of text stats") {
    // in the AQE plan print, codegen'd spans are marked `*(n)`
    val p = plan(graft.operators.TextAnalysis.textStats(spark, TestSpark.sf))
    assert(p.contains("*("), "expected WholeStageCodegen spans")
  }

  test("q6: every WHERE predicate reaches the scan as a pushed filter") {
    val p = Relational.q6Forecast(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), p.take(1200))
    val pushed = p.split("PushedFilters: ")(1).split("]")(0)
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"pushed: $pushed]")
  }

  test("q4: EXISTS plans as a left semi join, not a per-row subquery") {
    val p = plan(Relational.q4Priority(spark, TestSpark.sf))
    assert(p.contains("LeftSemi"), p.take(1200))
  }

  test("asof_join: union+window form, never a range join") {
    val p = plan(graft.operators.RelationalMore.asofJoin(spark, TestSpark.sf))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "as-of must not plan a range/cross join:\n" + p.take(1500))
    assert(p.contains("Window"), "running last() window expected")
  }

  test("ivf: cell assignment is shuffle-free before the probe join") {
    val p = plan(Similarity.ivfTopK(spark, TestSpark.sf, Seq(0L, 1L)))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // allowed shuffles: the per-query rank window and the output sort —
    // cell assignment itself is a pure projection, so at most 2 non-
    // broadcast exchanges may appear (count the AQE final plan only; the
    // printed string repeats the tree under "== Initial Plan ==")
    val finalPlan = p.split("== Initial Plan ==")(0)
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(finalPlan).length
    assert(shuffles <= 2, s"expected <=2 shuffle exchanges, got $shuffles:\n" +
      finalPlan.take(2000))
  }

  test("embedding near-dup: candidate join carries only (band, bucket, id)") {
    val df = Similarity.embeddingNearDupPairs(spark, TestSpark.sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("bm25: vocabulary-sized sides broadcast; the corpus never SMJs") {
    val p = plan(graft.operators.Retrieval.bm25Search(spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"),
      "df/stats joins must broadcast, not shuffle the corpus")
  }

  test("ranking windows run on aggregated vocab tables, not the corpus") {
    // the window input must be the post-aggregate (term, n) relation:
    // exactly two aggregates feed it (partial+final), and no window sits
    // below the first exchange
    val df = graft.operators.Retrieval.vocabulary(spark, TestSpark.sf)
    val p = plan(df)
    val firstWindow = p.indexOf("Window")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstWindow >= 0 && firstAgg >= 0 && firstWindow < firstAgg,
      "window (printed above) must consume the aggregate's output")
  }

  test("kmeans step: one corpus scan, no join back to embeddings") {
    val p = plan(Similarity.kmeansStep(spark, TestSpark.sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "assignment is a literal-argmax projection fused with the " +
        "re-average; a join means the fusion regressed")
  }

  test("range_join_binned: the interval join runs as an equality hash " +
      "join on the bin, never a nested loop, and matches the naive form") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.RelationalMore.rangeJoinBinned(spark, TestSpark.sf)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "bin bucketing must turn the range predicate into an equi-join key")
    // ground truth: the naive range join, computed directly
    val ev = graft.Tables.load(spark, TestSpark.sf, "events")
      .select(col("ts").cast("long").as("sec"))
    val inc = graft.Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "error")
      .orderBy(col("ts"), col("event_id")).limit(5)
      .select(col("event_id").as("inc_id"), col("ts").cast("long").as("inc_sec"))
    val naive = inc.crossJoin(ev)
      .filter(abs(col("sec") - col("inc_sec")) <= 86400L)
      .groupBy(col("inc_id")).agg(count(lit(1)).as("n_within"))
    assert(df.exceptAll(naive).isEmpty && naive.exceptAll(df).isEmpty)
  }
}
