package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-atomic commit protocol for in-place index maintenance
  * (round-10 verdict item 1).
  *
  * The ANN maintenance lifecycles ([[graft.operators.Similarity]]'s
  * `lshCompact` / `ivfCompact` / `ivfPqCompact`) rewrite the touched
  * partitions of a live index and append to a sibling store. Performed
  * directly (dynamic partition overwrite + a second append write), a
  * crash mid-sequence leaves a MIXED index — some partitions new, some
  * old, the vectors append half-landed — that no reader can detect.
  * This module turns the whole multi-directory mutation into one
  * redo-logged transaction with a single atomic commit point:
  *
  *  1. STAGE — every new file is written under
  *     `<root>/_graft_txn/<txnId>/…` (Spark ignores `_`-prefixed dirs,
  *     so staging is invisible to readers). The live tree is untouched.
  *  2. COMMIT — the op list (which staged dir replaces which live
  *     partition dir; which staged file appends where) is written to
  *     `_COMMIT.tmp` and RENAMED to `_COMMIT`. The rename of a file to
  *     a fresh name is the one atomic primitive every Hadoop
  *     `FileSystem` guarantees (HDFS, local; object stores emulate it)
  *     — this rename IS the commit point.
  *  3. APPLY — each op moves its staged dir/file into the live tree
  *     (delete target, rename staged in). Every op is idempotent: a
  *     staged source that no longer exists means the op already
  *     applied, so re-running the list after a crash completes it.
  *  4. CLEAN — the txn dir (marker included) is deleted; the
  *     transaction is gone.
  *
  * [[recover]] makes the guarantee usable: it rolls a marker-less txn
  * BACK (pre-commit crash — staging debris deleted, live tree was
  * never touched) and rolls a marked txn FORWARD (post-commit crash —
  * the apply list re-runs to completion). Maintenance entry points and
  * the indexed probe lanes call it first, so any reader that goes
  * through the library sees exactly old-state or exactly new-state,
  * never a mix — `IndexCommitSpec` kills the protocol at every point
  * and pins both outcomes.
  *
  * Concurrency model, stated not hidden:
  *
  *  - ONE writer (maintenance run) at a time — two concurrent
  *    compactions of one index need external mutual exclusion; at
  *    100 TB that is the table-format lock service (or the JdbcSink
  *    advisory-lock pattern). Spark's own job-level output commit has
  *    the same single-committer contract.
  *  - READERS are concurrent with the writer and with each other, and
  *    probe-side healing is safe under that: [[recoverForRead]] rolls
  *    committed transactions FORWARD only — it never touches a
  *    marker-less staging dir, because "marker-less" cannot be
  *    distinguished from a LIVE writer mid-stage, and deleting a live
  *    staging would silently drop the writer's batch (staging is
  *    `_`-invisible to scans, so leaving it costs readers nothing;
  *    rollback belongs to the next writer's [[begin]], where the
  *    single-writer discipline makes it safe).
  *  - Roll-forward itself serializes on a HEALING LOCK inside the txn
  *    dir: without it, two healers (two probes after a crash; or a
  *    probe racing the writer's own apply) can interleave
  *    delete(target)/rename(staged) and lose a partition. The writer
  *    takes the lock before publishing the marker, so a reader that
  *    sees the marker mid-apply WAITS for the txn dir to disappear
  *    instead of racing. Lock acquisition is write-then-verify (an
  *    owner UUID read back after a settle delay) so it stays correct
  *    even where `create(overwrite=false)` is check-then-act rather
  *    than atomic (local FS; HDFS creates are namenode-atomic), and
  *    carries a LEASE: a lock older than `leaseMs` is presumed
  *    crashed and stolen via atomic rename (only one stealer wins).
  *    The lease must out-live any healthy apply — apply is O(touched)
  *    metadata renames, so the 5-minute default has orders-of-
  *    magnitude headroom; a waiter that can neither acquire nor steal
  *    fails loudly after `waitMs` rather than reading a possibly-mixed
  *    tree.
  *
  * The op log is line-oriented `R<TAB>target<TAB>staged` /
  * `A<TAB>target<TAB>staged` with repo-controlled relative paths
  * (`band=…/bucket=…`, `cell=…`, txn-unique file names) — no escaping
  * needed, trivially replayable.
  *
  * Cost shape at scale: staging writes exactly the bytes the
  * non-atomic path wrote (touched partitions + the arriving batch);
  * commit adds one small file create + one rename; apply adds
  * O(touched) metadata renames. Nothing index-sized moves. */
object IndexCommit {

  /** Staging root name — `_` prefix keeps it out of every Spark scan. */
  val TxnDirName = "_graft_txn"

  /** Healing-lock file name inside a txn dir (see object doc). */
  val HealLockName = "_HEALING"

  /** Lease on a healing lock: a holder silent for this long is
    * presumed crashed and its lock is stolen. Must out-live any healthy
    * apply (O(touched) metadata renames — milliseconds to seconds), so
    * 5 minutes has orders-of-magnitude headroom. `var` as a test seam
    * (the [[killPoint]] precedent): the kill-point spec compresses the
    * lease to heal its own same-JVM "crashes" immediately — never set
    * outside specs. */
  private[graft] var HealLeaseMs: Long = 5 * 60 * 1000L

  /** Bound on waiting for a busy healer before failing loudly (same
    * test-seam discipline as [[HealLeaseMs]]). */
  private[graft] var HealWaitMs: Long = 60 * 1000L

  /** Write-then-verify acquisition of the healing lock under `txnDir`.
    * Returns true = this caller owns healing; false = the transaction
    * was retired by a peer while waiting (txn dir gone — nothing left
    * to heal). Stale locks (older than `leaseMs`) are stolen via
    * atomic rename, so exactly one stealer wins. Throws after `waitMs`
    * if the lock stays busy and fresh — a healer that can neither
    * acquire nor steal must not proceed into a possibly-mixed tree. */
  private[graft] def acquireHealLock(fs: FileSystem, txnDir: Path,
      leaseMs: Long, waitMs: Long): Boolean = {
    val lock = new Path(txnDir, HealLockName)
    val me = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    while (true) {
      if (!fs.exists(txnDir)) return false
      val created =
        try {
          val out = fs.create(lock, false)
          try out.write(me.getBytes("UTF-8")) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      if (created) {
        // settle, then read back: where create(overwrite=false) is
        // check-then-act (local FS), two racers may both have written;
        // the file holds the LAST write, so exactly one sees itself
        Thread.sleep(25)
        val owner =
          try {
            val in = fs.open(lock)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          } catch { case _: java.io.IOException => "" }
        if (owner == me) return true
      } else {
        // busy: steal only a lease-expired lock (atomic rename — one
        // stealer wins), then loop back to a fresh acquisition attempt
        val stale =
          try {
            val st = fs.getFileStatus(lock)
            System.currentTimeMillis() - st.getModificationTime > leaseMs
          } catch { case _: java.io.IOException => false }
        if (stale) {
          try fs.rename(lock, new Path(txnDir,
            HealLockName + ".stale-" + me.take(8)))
          catch { case _: java.io.IOException => () }
        }
      }
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"healing lock busy past ${waitMs}ms under $txnDir — " +
            "a healer is alive (wait) or the lease has not expired")
      Thread.sleep(50)
    }
    false // unreachable
  }

  /** One logged mutation. `target` is relative to the index root,
    * `staged` relative to the txn dir. */
  sealed trait Op { def target: String; def staged: String }
  /** Replace the live dir `target` with the staged dir (partition
    * rewrite). */
  final case class Replace(target: String, staged: String) extends Op
  /** Move the staged file to the (txn-unique, so never pre-existing)
    * live name `target` (append segment). */
  final case class Append(target: String, staged: String) extends Op

  /** Kill-point hook for the crash spec: invoked with "staged" (all new
    * files written, marker not yet published), "committed" (marker
    * published, live tree untouched), and "applied:i" after the i-th
    * apply op. A throwing hook models the process dying there. Test
    * seam only — never set outside specs. */
  private[graft] var killPoint: String => Unit = _ => ()

  /** An open transaction: stage writes under [[stagingDir]], then
    * [[commit]]. */
  final case class Txn(fs: FileSystem, root: Path, id: String) {
    val dir: Path = new Path(new Path(root, TxnDirName), id)
    def stagingDir(rel: String): Path = new Path(dir, rel)
  }

  private def fsOf(s: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  /** Heal `indexRoot`, then open a fresh transaction under it. Healing
    * first means a maintenance run after a crashed predecessor starts
    * from a CONSISTENT tree (single-writer discipline: at most one
    * crashed txn can be pending). */
  def begin(s: SparkSession, indexRoot: String): Txn = {
    val (fs, root) = fsOf(s, indexRoot)
    recover(fs, root)
    val txn = Txn(fs, root,
      "txn-" + java.util.UUID.randomUUID().toString.take(13))
    require(fs.mkdirs(txn.dir), s"cannot create txn dir ${txn.dir}")
    txn
  }

  /** Publish the commit marker (the atomic point), then apply + clean.
    * A crash anywhere before the marker rename leaves the live tree
    * untouched; anywhere after, [[recover]]/[[recoverForRead]]
    * completes the apply. The writer takes the HEALING LOCK before
    * publishing the marker, so a concurrent reader that sees the
    * marker waits out this apply instead of racing it (object doc). */
  def commit(txn: Txn, ops: Seq[Op]): Unit = {
    killPoint("staged")
    val lock = txn.fs.create(new Path(txn.dir, HealLockName), false)
    try lock.write("writer".getBytes("UTF-8")) finally lock.close()
    val tmp = new Path(txn.dir, "_COMMIT.tmp")
    val out = txn.fs.create(tmp, true)
    try ops.foreach { op =>
      val tag = op match { case _: Replace => "R"; case _: Append => "A" }
      out.write(s"$tag\t${op.target}\t${op.staged}\n".getBytes("UTF-8"))
    } finally out.close()
    require(txn.fs.rename(tmp, new Path(txn.dir, "_COMMIT")),
      s"commit-marker rename failed under ${txn.dir}")
    killPoint("committed")
    apply(txn.fs, txn.root, txn.dir, ops)
  }

  /** Re-runnable apply: each op fires only if its staged source still
    * exists (rename is atomic per path, so "source gone" ⟺ "op done"),
    * and finishes by deleting the txn dir — marker included — which
    * retires the transaction. */
  private def apply(fs: FileSystem, root: Path, txnDir: Path,
      ops: Seq[Op]): Unit = {
    ops.zipWithIndex.foreach { case (op, i) =>
      val staged = new Path(txnDir, op.staged)
      val target = new Path(root, op.target)
      if (fs.exists(staged)) {
        op match {
          case _: Replace => if (fs.exists(target)) fs.delete(target, true)
          case _: Append => require(!fs.exists(target),
            s"append target $target pre-exists — txn-unique naming broken")
        }
        val parent = target.getParent
        if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
        require(fs.rename(staged, target),
          s"apply rename $staged -> $target failed")
      }
      killPoint(s"applied:$i")
    }
    fs.delete(txnDir, true)
    // reap the txn root with its last child (the .graft-scratch
    // discipline) so healthy indexes carry no empty litter
    val txns = txnDir.getParent
    try {
      if (fs.exists(txns) && fs.listStatus(txns).isEmpty)
        fs.delete(txns, false)
    } catch { case _: java.io.IOException => () }
  }

  /** WRITER-side heal (called by [[begin]], under the single-writer
    * discipline): no marker → roll BACK (delete staging; the live tree
    * was never touched — safe here because no OTHER writer can be
    * mid-stage), marker → roll FORWARD through the healing lock.
    * Safe to call any time on a healthy index (no-op). */
  def recover(s: SparkSession, indexRoot: String,
      leaseMs: Long = HealLeaseMs, waitMs: Long = HealWaitMs): Unit = {
    val (fs, root) = fsOf(s, indexRoot)
    recover(fs, root, leaseMs, waitMs)
  }

  /** READER-side heal (probe lanes, before reading): rolls committed
    * transactions FORWARD only. Never deletes a marker-less staging —
    * a reader cannot distinguish "crashed pre-commit" from "live
    * writer mid-stage", and staging is scan-invisible anyway (object
    * doc). A healthy index pays one existence check. */
  def recoverForRead(s: SparkSession, indexRoot: String,
      leaseMs: Long = HealLeaseMs, waitMs: Long = HealWaitMs): Unit = {
    val (fs, root) = fsOf(s, indexRoot)
    recoverForRead(fs, root, leaseMs, waitMs)
  }

  private[graft] def recover(fs: FileSystem, root: Path): Unit =
    recover(fs, root, HealLeaseMs, HealWaitMs)

  /** FNF-tolerant txn listing: a CONCURRENT healer may reap the txn
    * root between the existence check and the listing (two probes
    * healing after the same maintenance run is normal operation) —
    * a vanished root means a peer finished, not an error. */
  private def listTxns(fs: FileSystem, txns: Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    try { if (fs.exists(txns)) fs.listStatus(txns) else Array.empty }
    catch {
      case _: java.io.FileNotFoundException => Array.empty
    }

  private[graft] def recover(fs: FileSystem, root: Path,
      leaseMs: Long, waitMs: Long): Unit = {
    val txns = new Path(root, TxnDirName)
    listTxns(fs, txns).foreach { st =>
      val marker = new Path(st.getPath, "_COMMIT")
      if (fs.exists(marker)) rollForward(fs, root, st.getPath, leaseMs, waitMs)
      else fs.delete(st.getPath, true)
    }
    reapIfEmpty(fs, txns)
  }

  private[graft] def recoverForRead(fs: FileSystem, root: Path,
      leaseMs: Long, waitMs: Long): Unit = {
    val txns = new Path(root, TxnDirName)
    listTxns(fs, txns).foreach { st =>
      val marker = new Path(st.getPath, "_COMMIT")
      if (fs.exists(marker)) rollForward(fs, root, st.getPath, leaseMs, waitMs)
      // marker-less: possibly a LIVE writer's staging — never touched
    }
    reapIfEmpty(fs, txns)
  }

  /** Serialize a roll-forward on the healing lock: acquire (waiting
    * out a live healer, stealing an expired one) and re-run the logged
    * apply; if the txn dir disappeared while waiting, a peer already
    * retired it — done. The marker is re-checked under the lock: the
    * dir may have been replayed and recreated between listing and
    * locking. */
  private def rollForward(fs: FileSystem, root: Path, txnDir: Path,
      leaseMs: Long, waitMs: Long): Unit =
    if (acquireHealLock(fs, txnDir, leaseMs, waitMs)) {
      val marker = new Path(txnDir, "_COMMIT")
      if (fs.exists(marker)) apply(fs, root, txnDir, readOps(fs, marker))
      else // lock landed on a dead husk a peer is mid-deleting
        try fs.delete(txnDir, true)
        catch { case _: java.io.IOException => () }
    }

  private def reapIfEmpty(fs: FileSystem, txns: Path): Unit =
    try {
      if (fs.exists(txns) && fs.listStatus(txns).isEmpty)
        fs.delete(txns, false)
    } catch { case _: java.io.IOException => () }

  private def readOps(fs: FileSystem, marker: Path): Seq[Op] = {
    val in = fs.open(marker)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array("R", t, s) => Replace(t, s)
        case Array("A", t, s) => Append(t, s)
        case _ => throw new IllegalStateException(
          s"corrupt commit marker line: $line")
      }
    }.toSeq
  }

  /** The staged hive partition dirs of a freshly written staging tree,
    * as [[Replace]] ops against the same-named live dirs. `relBase` is
    * the staged subdir that mirrors the live layout root (e.g. staged
    * `postings` vs live `postings`); one level per partition column. */
  private[graft] def replaceOpsFor(txn: Txn, stagedSub: String,
      liveSub: String, partitionDepth: Int): Seq[Replace] = {
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else txn.fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => leaves(st.getPath, depth - 1))
    val base = txn.stagingDir(stagedSub)
    if (!txn.fs.exists(base)) Seq.empty
    else leaves(base, partitionDepth).map { leaf =>
      val rel = leaf.toString.stripPrefix(base.toString)
        .stripPrefix("/")
      val livePrefix = if (liveSub.isEmpty) "" else liveSub + "/"
      Replace(livePrefix + rel, stagedSub + "/" + rel)
    }.sortBy(_.target)
  }

  /** The staged data files of an append segment, as [[Append]] ops to
    * txn-unique live names (`<liveSub>/<txnId>-<filename>` — a replay
    * can never collide with an earlier segment). `_SUCCESS`/hidden
    * files are dropped. */
  private[graft] def appendOpsFor(txn: Txn, stagedSub: String,
      liveSub: String): Seq[Append] = {
    val base = txn.stagingDir(stagedSub)
    if (!txn.fs.exists(base)) Seq.empty
    else txn.fs.listStatus(base).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => Append(s"$liveSub/${txn.id}-${st.getPath.getName}",
        s"$stagedSub/${st.getPath.getName}"))
      .sortBy(_.target)
  }
}
