package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("media table: payload bytes match source text length (UTF-8)") {
    val meta = Multimodal.mediaMeta(spark, TestSpark.sf).collect()
    assert(meta.length === 500)
    val kinds = meta.map(_.getString(1)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("metadata projection prunes the payload column at the scan") {
    val plan = Multimodal.mediaMeta(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the parquet scan must only read the columns meta needs
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("props"))
  }

  test("feature extraction: fixed-width vectors, deterministic across partitionings") {
    val f1 = Multimodal.extractFeatures(spark, TestSpark.sf).collect()
    assert(f1.length === 500)
    assert(f1.forall(_.getSeq[Float](3).length === 8))
    assert(f1.forall(r => r.getLong(2) > 0))
    val again = Multimodal.extractFeatures(spark, TestSpark.sf).collect()
    assert(f1.map(_.getSeq[Float](3)).toSeq === again.map(_.getSeq[Float](3)).toSeq)
  }

  test("scalar feature projection matches the array variant, column-per-dim") {
    val scalars = Multimodal.extractFeatureScalars(spark, TestSpark.sf)
    assert(scalars.columns.toSeq ===
      Seq("media_id", "kind", "n_bytes") ++ (0 until 8).map(i => s"f$i"))
    val arr = Multimodal.extractFeatures(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    val sc = scalars.collect()
    assert(sc.length === 500)
    sc.foreach { r =>
      val expect = arr(r.getLong(0))
      (0 until 8).foreach { i =>
        assert(r.getDouble(3 + i) === expect(i).toDouble)
      }
    }
  }

  test("resize: images only, payload shrinks, metadata tracks the ratio") {
    val out = Multimodal.resizeImages(spark, TestSpark.sf, targetWidth = 64)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1) == "image"))
    // deterministic across runs
    val again = Multimodal.resizeImages(spark, TestSpark.sf, targetWidth = 64)
      .collect()
    assert(out.map(_.getString(5)).toSeq === again.map(_.getString(5)).toSeq)
    // metadata contract: resized width never exceeds source-derived bound
    assert(out.forall(r => r.getInt(2) >= 1 && r.getLong(4) >= 1))
  }

  test("frame sampling: n frames per video, fixed frame size") {
    val frames = Multimodal.sampleFrames(spark, TestSpark.sf, n = 4,
      frameBytes = 16).collect()
    assert(frames.nonEmpty)
    val perMedia = frames.groupBy(_.getLong(0))
    assert(perMedia.values.forall(_.length === 4))
    assert(frames.forall(_.getLong(2) === 16))
  }
}
