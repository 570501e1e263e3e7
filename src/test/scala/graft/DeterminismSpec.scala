package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Layout, Retrieval, Similarity, Sketches, TextAnalysis}

/** Partitioning-invariance gate for the round-8 operators whose
  * Scaladoc claims engine- and layout-exact results: every decimal-sum,
  * banded-window, and literal-metadata discipline must return IDENTICAL
  * rows whatever the shuffle layout — the property that makes the
  * DuckDB hash oracle meaningful on a real cluster, where partition
  * counts are never the test harness's. (The source_similarity spec
  * pioneered this check; this suite applies it across the new
  * operator families.) */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def underPartitions[T](n: Int)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("banded/decimal operators return identical rows under 2 vs 17 " +
      "shuffle partitions") {
    val ops: Seq[(String, () => Seq[org.apache.spark.sql.Row])] = Seq(
      ("compaction_plan",
        () => Layout.compactionPlan(spark, sf).collect().toSeq),
      ("quality_psi",
        () => TextAnalysis.qualityPsi(spark, sf).collect().toSeq),
      ("ab_test",
        () => TextAnalysis.abKeepTest(spark, sf).collect().toSeq),
      ("embed_power_iter",
        () => Similarity.powerIterStep(spark, sf).collect().toSeq),
      ("embed_whiten",
        () => Similarity.abttWhiten(spark, sf).collect().toSeq),
      ("poisson_bootstrap",
        () => Curation.poissonBootstrap(spark, sf).collect().toSeq),
      ("weighted_sample",
        () => Curation.weightedSample(spark, sf).collect().toSeq),
      ("zipf_fit",
        () => Retrieval.zipfFit(spark, sf).collect().toSeq),
      ("scd2_history",
        () => graft.operators.RelationalMore.scd2History(spark, sf)
          .collect().toSeq),
      // merge_consistent compares two Datasketches estimates for exact
      // double equality — only safe because BOTH pass through the same
      // hll_union_agg estimator path; this pin catches a layout that
      // would route one lane through a different estimator
      ("hll_merge_gate",
        () => Sketches.hllMergeGate(spark, sf).collect().toSeq),
      // round-9 scratch-write lifecycles: their t6-floored rank orders
      // and closed-form booleans must survive any shuffle layout (the
      // index build itself repartitions by cell/fid internally, so the
      // session shuffle-partition count must not leak into results)
      ("ann_ivf_batch",
        () => Similarity.annIvfBatchPlanted(spark, sf).collect().toSeq),
      ("ann_ivfpq_batch",
        () => Similarity.annIvfPqBatch(spark, sf).collect().toSeq),
      ("layout_skipping_gate",
        () => Layout.layoutSkippingGate(spark, sf).collect().toSeq),
      ("zorder_skip_gate",
        () => Layout.zorderSkippingGate(spark, sf).collect().toSeq),
      ("bloom_skip_gate",
        () => Layout.bloomSkippingGate(spark, sf).collect().toSeq),
      ("file_compaction_gate",
        () => Layout.fileCompactionGate(spark, sf).collect().toSeq),
      ("mart_incremental",
        () => graft.operators.Relational.martIncremental(spark, sf)
          .collect().toSeq),
      ("schema_evolution_gate",
        () => graft.store.PartitionedStore.schemaEvolutionGate(spark, sf)
          .collect().toSeq),
      ("forget_gate",
        () => graft.store.PartitionedStore.forgetGate(spark, sf)
          .collect().toSeq),
      ("retention_gate",
        () => graft.store.PartitionedStore.retentionGate(spark, sf)
          .collect().toSeq),
      ("weather_derived",
        () => graft.models.WeatherModels.derivedDaily(spark, sf)
          .collect().toSeq))
    ops.foreach { case (name, f) =>
      val a = underPartitions(2)(f())
      val b = underPartitions(17)(f())
      assert(a === b, s"$name is not partitioning-invariant")
    }
  }
}
