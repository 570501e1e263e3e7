package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Projection

/** JL random-projection invariants beyond the generated-SQL oracle:
  * an independent driver-side recompute (different code path, same
  * arithmetic contract), the JL norm-concentration guarantee, the
  * shuffle-free plan shape, and golden sign-matrix values so an
  * accidental reseed fails attributably instead of silently changing
  * every downstream hash. */
class ProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("sign matrix is pinned (golden values) and roughly balanced") {
    // golden: first row prefix + the diagonal; any change to the mix
    // constants or index flattening trips this, not a downstream hash
    assert((0 until 8).map(i => Projection.sign(0, i)) ==
      Seq(-1, -1, 1, -1, 1, 1, 1, -1))
    assert((0 until 16).map(j => Projection.sign(j, j)) ==
      Seq(-1, -1, -1, -1, -1, -1, -1, 1, 1, -1, -1, 1, -1, 1, 1, -1))
    val all = for (j <- 0 until Projection.OutDim;
      i <- 0 until Projection.Dim) yield Projection.sign(j, i)
    assert(all.forall(s => s == 1 || s == -1))
    val imbalance = math.abs(all.sum).toDouble / all.size
    assert(imbalance < 0.1, s"sign matrix imbalance $imbalance")
    // rows are pairwise near-orthogonal (what preserves geometry): the
    // dot of two distinct ±1 rows should be o(Dim)
    for (a <- 0 until Projection.OutDim; b <- a + 1 until Projection.OutDim) {
      val dot = (0 until Projection.Dim)
        .map(i => Projection.sign(a, i) * Projection.sign(b, i)).sum
      assert(math.abs(dot) <= 28, s"rows $a,$b correlate: $dot")
    }
  }

  test("projection matches an independent driver-side fold bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    val got = Projection.randomProjection(spark, sf)
      .filter(col("vec_id") < 10).collect()
    assert(got.length == 10)
    got.foreach { row =>
      val v = emb(row.getLong(0))
      for (j <- 0 until Projection.OutDim) {
        // same fold: left-to-right double adds of ±widened floats, ×0.25
        var acc = 0.0
        for (i <- 0 until Projection.Dim) {
          val x = v(i).toDouble
          acc += (if (Projection.sign(j, i) > 0) x else -x)
        }
        val expect = graft.functions.Num.t6d(acc * 0.25)
        assert(row.getDouble(1 + j) == expect,
          s"vec ${row.getLong(0)} dim $j: ${row.getDouble(1 + j)} vs $expect")
      }
    }
  }

  test("JL norm concentration: corpus mean ratio near 1, spread bounded") {
    val ratios = Projection.randomProjection(spark, sf)
      .select("norm_ratio").collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.9 && mean < 1.1, s"mean norm ratio $mean")
    // k=16 sign projection: ratio² has std ≈ sqrt(2/k) ≈ 0.35; the
    // corpus should live inside a loose 4-sigma band
    val outliers = ratios.filterNot(r => r > 0.2 && r < 2.0)
    assert(outliers.isEmpty, s"outlier ratios: ${outliers.mkString(",")}")
  }

  test("projection plans as one narrow shuffle-free scan") {
    val plan = Projection.randomProjection(spark, sf)
      .queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    val beforeSort = plan.linesIterator.filterNot(_.contains("Sort"))
    assert(!beforeSort.exists(_.contains("Exchange hashpartitioning")),
      "the projection map must not shuffle")
  }

  test("planted probes survive the candidate cut and rerank to rank 1") {
    val rows = Projection.rpTopKPlanted(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 1000000L)
      assert(r.getInt(2) == 1 && r.getBoolean(3))
    }
  }

  test("bulk-probe fallback: broadcastProbes=false yields bit-identical " +
      "rows through shuffled joins on the RP batch lane") {
    // the same past-broadcast-capacity contract the LSH/IVF/IVF-PQ batch
    // lanes carry (SimilaritySpec): auto-broadcast disabled so neither
    // the planner nor AQE can pick a broadcast join — the lane must run
    // its cross/candidate/rerank joins distributed and change NOTHING
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf, "embeddings")
    val qDf = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val hinted = rowsOf(Projection.rpTopKBatchOn(emb, qDf, k = 10)
      .select("q_id", "vec_id", "cos_sim"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = Projection.rpTopKBatchOn(emb, qDf, k = 10,
        broadcastProbes = false)
      assert(rowsOf(shuffled.select("q_id", "vec_id", "cos_sim")) === hinted)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"hint must be withheld when broadcastProbes=false:\n${
          plan.take(1200)}")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
