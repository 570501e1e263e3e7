package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.store.IndexCommit
import graft.store.IndexCommit.{Append, Op, Replace}

/** Property-shaped kill-point coverage for the index-commit protocol:
  * the hand-written `IndexCommitSpec` kills ONE lifecycle (lshCompact)
  * at three points; this spec drives the protocol itself over RANDOM
  * transactions — arbitrary mixes of partition Replaces and segment
  * Appends against a randomized live tree — killed at EVERY possible
  * point of each, and asserts the invariant the protocol sells:
  *
  *   after recovery, the tree is EXACTLY the old state (killed before
  *   the marker) or EXACTLY the in-memory model of the new state
  *   (killed at/after the marker) — never anything else, for any op
  *   mix and any kill point.
  *
  * Pure Hadoop-FS level (no Spark jobs), so hundreds of (txn, kill)
  * cases run in seconds. Generators use fixed seeds (the scalatestplus
  * bridge is not in the offline cache) — deterministic, still
  * property-shaped (the PipelinePropertySpec discipline). */
class IndexCommitPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fsRoot(tag: String): (FileSystem, Path) = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  private def write(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Relative-path → content inventory of the live tree (txn staging
    * and lock debris excluded — they are scan-invisible by contract). */
  private def inventory(fs: FileSystem, root: Path): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.getPath.getName == IndexCommit.TxnDirName) ()
      else if (st.isDirectory) walk(st.getPath)
      else {
        val in = fs.open(st.getPath)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        out(st.getPath.toString.stripPrefix(root.toString)
          .stripPrefix("/")) = text
      }
    }
    if (fs.exists(root)) walk(root)
    out.toMap
  }

  /** One generated transaction: which partitions get replaced (with
    * how many files and what content tag) and how many files append. */
  private case class TxnShape(replaced: List[(Int, Int)], appends: Int)

  private val shapeGen: Gen[TxnShape] = for {
    nRep <- Gen.choose(0, 4)
    parts <- Gen.pick(nRep, 0 to 5)
    files <- Gen.listOfN(nRep, Gen.choose(1, 3))
    appends <- Gen.choose(0, 3)
  } yield TxnShape(parts.toList.sorted.zip(files), appends)

  private def shapes(n: Int, seed: Long): List[TxnShape] =
    Gen.listOfN(n, shapeGen).pureApply(Gen.Parameters.default, Seed(seed))

  /** Build a live tree: 6 hive partitions × 2 files + a vectors dir. */
  private def buildLive(fs: FileSystem, root: Path): Unit = {
    for (p <- 0 to 5; f <- 0 to 1)
      write(fs, new Path(root, s"p=$p/old-$f.parquet"), s"old-$p-$f")
    write(fs, new Path(root, "vectors/seg-0.parquet"), "vec-0")
  }

  /** Stage the shape's files and return (ops, expected-new-inventory
    * transform applied to `before`). */
  private def stage(fs: FileSystem, txn: IndexCommit.Txn, shape: TxnShape,
      before: Map[String, String]): (Seq[Op], Map[String, String]) = {
    var expect = before
    shape.replaced.foreach { case (p, nf) =>
      for (f <- 0 until nf)
        write(fs, new Path(txn.stagingDir(s"parts/p=$p"),
          s"new-$f.parquet"), s"new-$p-$f")
      expect = expect.filterNot(_._1.startsWith(s"p=$p/")) ++
        (0 until nf).map(f => s"p=$p/new-$f.parquet" -> s"new-$p-$f")
    }
    for (a <- 0 until shape.appends) {
      write(fs, new Path(txn.stagingDir("seg"), s"app-$a.parquet"),
        s"app-$a")
      expect = expect + (s"vectors/${txn.id}-app-$a.parquet" -> s"app-$a")
    }
    val ops = IndexCommit.replaceOpsFor(txn, "parts", "",
      partitionDepth = 1) ++
      IndexCommit.appendOpsFor(txn, "seg", "vectors")
    (ops, expect)
  }

  /** Every kill point a txn of this shape passes through. */
  private def killPoints(shape: TxnShape): Seq[String] = {
    val nOps = shape.replaced.size + shape.appends
    Seq("staged", "committed") ++ (0 until nOps).map(i => s"applied:$i")
  }

  test("random transactions killed at every point recover to exactly " +
      "old state (pre-marker) or exactly the modeled new state " +
      "(post-marker) — never a mix") {
    val prevLease = IndexCommit.HealLeaseMs
    val prevWriter = IndexCommit.WriterLeaseMs
    IndexCommit.HealLeaseMs = 0L
    IndexCommit.WriterLeaseMs = 0L // crashed writers leave a fresh root lease
    try {
      var cases = 0
      shapes(12, seed = 20260815L).foreach { shape =>
        killPoints(shape).foreach { at =>
          val (fs, root) = fsRoot("graft_icp_")
          buildLive(fs, root)
          val before = inventory(fs, root)
          val txn = IndexCommit.begin(spark, root.toString)
          val (ops, expect) = stage(fs, txn, shape, before)
          IndexCommit.killPoint = ev =>
            if (ev == at) throw new RuntimeException(s"KILLED@$ev")
          val killed =
            try { IndexCommit.commit(txn, ops); false }
            catch {
              case e: RuntimeException if e.getMessage == s"KILLED@$at" =>
                true
            }
          IndexCommit.killPoint = _ => ()
          // a kill point past the op count never fires — commit ran clean
          IndexCommit.recover(spark, root.toString)
          val after = inventory(fs, root)
          val wantOld = killed && at == "staged"
          assert(after === (if (wantOld) before else expect),
            s"shape=$shape kill=$at killed=$killed")
          assert(!fs.exists(new Path(root, IndexCommit.TxnDirName)),
            s"txn must be retired: shape=$shape kill=$at")
          cases += 1
          fs.delete(root, true)
        }
      }
      assert(cases >= 40, s"property exercised only $cases cases")
    } finally {
      IndexCommit.killPoint = _ => ()
      IndexCommit.HealLeaseMs = prevLease
      IndexCommit.WriterLeaseMs = prevWriter
    }
  }

  test("a second crash DURING recovery still converges: kill the " +
      "roll-forward mid-apply, recover again, state is exactly new") {
    val prevLease = IndexCommit.HealLeaseMs
    val prevWriter = IndexCommit.WriterLeaseMs
    IndexCommit.HealLeaseMs = 0L
    IndexCommit.WriterLeaseMs = 0L
    try {
      shapes(8, seed = 42L).filter(s =>
        s.replaced.size + s.appends >= 2).foreach { shape =>
        val (fs, root) = fsRoot("graft_icp2_")
        buildLive(fs, root)
        val before = inventory(fs, root)
        val txn = IndexCommit.begin(spark, root.toString)
        val (ops, expect) = stage(fs, txn, shape, before)
        // first crash: immediately after the marker publishes
        IndexCommit.killPoint = ev =>
          if (ev == "committed") throw new RuntimeException("KILLED@committed")
        intercept[RuntimeException](IndexCommit.commit(txn, ops))
        // second crash: the HEALER dies after its first applied op
        IndexCommit.killPoint = ev =>
          if (ev == "applied:0") throw new RuntimeException("KILLED@applied:0")
        intercept[RuntimeException](IndexCommit.recover(spark, root.toString))
        IndexCommit.killPoint = _ => ()
        // third healer completes
        IndexCommit.recover(spark, root.toString)
        assert(inventory(fs, root) === expect,
          s"double-crash recovery must converge: shape=$shape")
        fs.delete(root, true)
      }
    } finally {
      IndexCommit.killPoint = _ => ()
      IndexCommit.HealLeaseMs = prevLease
      IndexCommit.WriterLeaseMs = prevWriter
    }
  }
}
