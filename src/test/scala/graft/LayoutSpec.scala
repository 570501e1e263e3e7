package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order invariants: the Column-expression Morton code matches an
  * independent bit-twiddling reference, and the bucket bounding boxes
  * exhibit exactly the rectangle locality data skipping depends on. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Independent reference: classic parallel-prefix bit interleave. */
  private def mortonRef(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var n = v & 0xffffL
      n = (n | (n << 8)) & 0x00ff00ffL
      n = (n | (n << 4)) & 0x0f0f0f0fL
      n = (n | (n << 2)) & 0x33333333L
      n = (n | (n << 1)) & 0x55555555L
      n
    }
    spread(x) | (spread(y) << 1)
  }

  test("zValue equals the parallel-prefix reference on corpus keys") {
    val rows = Tables.load(spark, TestSpark.sf, "lineitem")
      .select(col("l_partkey").bitwiseAND(lit(65535L)).as("x"),
        col("l_suppkey").bitwiseAND(lit(65535L)).as("y"))
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .limit(2000).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)}): expression diverges")
    }
  }

  test("skew audit: ranks are dense, counts non-increasing, stats " +
      "reconcile with an independent recount") {
    val rows = Layout.skewAudit(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    val ns = rows.map(_.getLong(2))
    assert(ns.sameElements(ns.sortBy(-_)), "top keys must be count-desc")
    // independent recount of the headline stats
    val counts = Tables.load(spark, TestSpark.sf, "lineitem")
      .groupBy("l_partkey").count().collect().map(_.getLong(1))
    val r = rows.head
    assert(r.getLong(3) === counts.length.toLong)
    assert(r.getLong(4) === counts.max)
    assert(r.getLong(2) === counts.max, "rank 1 carries the max count")
    assert(r.getDouble(6) >= 1.0, "max/mean skew ratio is >= 1")
  }

  test("zorder buckets are exact 256x256 rectangles and partition " +
      "every row") {
    val rows = Layout.zorderStats(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.load(spark, TestSpark.sf, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val (bucket, minX, maxX, minY, maxY) = (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      // bucket = top-16 Morton bits = the high 8 bits of each dimension:
      // every bucket's box lives inside ONE 256-aligned 256x256 cell
      assert(minX >> 8 === maxX >> 8,
        s"bucket $bucket spans x cells ${minX >> 8}..${maxX >> 8}")
      assert(minY >> 8 === maxY >> 8,
        s"bucket $bucket spans y cells ${minY >> 8}..${maxY >> 8}")
      // and the bucket id reconstructs from those high bits
      val expected = mortonRef(minX >> 8, minY >> 8)
      assert(bucket === expected,
        s"bucket $bucket != morton(${minX >> 8}, ${minY >> 8})")
    }
  }

  test("compaction plan equals an independent next-fit-decreasing " +
      "packing, and only each source's last group may be under-filled") {
    val target = 4096L
    val files = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 > 0)
    // independent reference: plain per-source sort + sequential cumsum
    val expect = files.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      val ordered = fs.toSeq.sortBy { case (_, id, b) => (-b, id) }
      var cum = 0L
      ordered.map { case (_, _, b) =>
        val grp = cum / target // integer division == floor for cum >= 0
        cum += b
        (src, grp, b)
      }
    }
      .groupBy { case (src, grp, _) => (src, grp) }
      .map { case ((src, grp), rows) =>
        val bs = rows.map(_._3)
        (src, grp) -> ((bs.length.toLong, bs.sum, bs.max, bs.min))
      }
    val got = Layout.compactionPlan(spark, TestSpark.sf, target).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === expect)
    // boundary property of floor-of-cumsum packing: a group's starting
    // offset always lies inside its own [grp*target, (grp+1)*target)
    // window, so group SPANS never interleave across sources' orderings
    got.foreach { case ((src, grp), (n, bytes, mx, mn)) =>
      assert(n > 0 && bytes >= mx && mx >= mn, s"$src/$grp malformed")
    }
  }

  test("layout skipping gate: all four invariants TRUE") {
    val r = Layout.layoutSkippingGate(spark, TestSpark.sf).collect()
    assert(r.length === 1)
    (0 until 4).foreach(i => assert(r(0).getBoolean(i),
      s"gate column $i false"))
  }

  test("file compaction gate: all five invariants TRUE, and the " +
      "rewrite actually lands at the planned file count") {
    val r = Layout.fileCompactionGate(spark, TestSpark.sf).collect()
    assert(r.length === 1)
    (0 until 5).foreach(i => assert(r(0).getBoolean(i),
      s"gate column $i false"))
  }

  test("zorder skipping gate: aligned z-cell files prune BOTH " +
      "dimensions while the single-key sort is blind on the second") {
    val r = Layout.zorderSkippingGate(spark, TestSpark.sf).collect()
    assert(r.length === 1)
    val cols = Seq("layouts_written", "single_key_blind_y",
      "single_key_skips_x", "zorder_skips_y", "zorder_skips_x",
      "rows_agree")
    cols.zipWithIndex.foreach { case (c, i) =>
      assert(r(0).getBoolean(i), s"$c false")
    }
  }

  test("bloom skipping gate: the bloomed copy's reader skips a point " +
      "lookup min/max stats are provably blind to") {
    val r = Layout.bloomSkippingGate(spark, TestSpark.sf).collect()
    assert(r.length === 1)
    val cols = Seq("layouts_written", "stats_blind_full_decode",
      "bloom_skips", "rows_agree")
    cols.zipWithIndex.foreach { case (c, i) =>
      assert(r(0).getBoolean(i), s"$c false")
    }
  }

  test("clustered layout actually skips at the parquet reader: the " +
      "pushed range predicate decodes a fraction of the rows the " +
      "scattered layout decodes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_skip_")
    try {
      val li = Tables.load(spark, TestSpark.sf, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      li.repartitionByRange(16, col("l_partkey"))
        .write.parquet(s"$dir/clustered")
      li.repartition(16, col("l_orderkey"))
        .write.parquet(s"$dir/unclustered")
      val maxPk = li.agg(max(col("l_partkey"))).head().getLong(0)
      val lo = maxPk / 4
      val hi = lo + math.max(maxPk / 16, 8L)
      // rows the parquet READER emits (post row-group skip, pre
      // re-filter): with one row group per small file, min/max stats
      // skip whole non-overlapping groups before any value is decoded.
      // AQE is off for the measurement so the scan node (and its
      // metrics) sit in the plan directly instead of inside opaque
      // query-stage wrappers.
      def scanRows(path: String): Long = {
        val q = spark.read.parquet(path)
          .filter(col("l_partkey") >= lo && col("l_partkey") <= hi)
          .agg(count(lit(1)))
        q.collect()
        val plan = q.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val scans = plan.collect { case f: FileSourceScanExec => f }
        assert(scans.nonEmpty, "no FileSourceScanExec found")
        assert(scans.head.metadata("PushedFilters").contains("l_partkey"),
          "range predicate must reach PushedFilters")
        scans.head.metrics("numOutputRows").value
      }
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val (clustered, scattered) =
        try (scanRows(s"$dir/clustered"), scanRows(s"$dir/unclustered"))
        finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      val total = li.count()
      assert(scattered === total,
        "scattered layout must decode the whole table (no stats help)")
      assert(clustered * 2 <= scattered,
        s"clustered reader decoded $clustered vs $scattered — layout " +
          "did not skip")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
