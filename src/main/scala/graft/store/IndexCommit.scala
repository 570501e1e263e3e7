package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-atomic commit protocol for in-place index maintenance
  * (round-10 verdict item 1; round-12: built-in writer lease +
  * object-store capability gate).
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
  *     a fresh name is the atomic primitive of every filesystem this
  *     protocol admits (see the capability gate below) — this rename
  *     IS the commit point.
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
  * the indexed probe lanes call it first.
  *
  * What the protocol guarantees, stated precisely: CRASH-ATOMICITY for
  * readers that HEAL BEFORE SCANNING. A reader that runs
  * [[recoverForRead]] and then plans its scan sees exactly old-state
  * or exactly new-state — `IndexCommitSpec` kills the protocol at
  * every point and pins both outcomes. A scan already IN FLIGHT while
  * an apply swaps a partition (delete target, rename staged in) can
  * observe the partition mid-swap — absent, or FileNotFound — exactly
  * as it can under Spark's own dynamic partition overwrite. Removing
  * that window needs versioned immutable segments behind a manifest
  * commit (readers resolve a snapshot; commit publishes one small
  * file, apply moves nothing) — which is exactly what the sibling
  * [[ManifestStore]] provides (round 12), object stores included; the
  * probe lanes here heal-then-scan, which is the contract THIS module
  * keeps for in-place hive trees.
  *
  * FILESYSTEM CAPABILITY GATE: both the commit marker's atomicity and
  * the "nothing index-sized moves" cost claim assume `rename` is an
  * atomic O(1) metadata move. That holds for HDFS-like stores
  * (`hdfs`, `viewfs`, ADLS Gen2's `abfs`/`abfss`) and the local FS —
  * and does NOT hold on flat-namespace object stores: on `s3a`/`gs`/
  * `wasb` a directory rename is a COPY of every object (O(index
  * bytes)) and even the single-file marker rename decays to
  * copy+delete (two operations — a crash between them double-exposes
  * or loses the marker). Rather than silently degrade on the exact
  * stores big indexes live on, every public entry point FAILS FAST
  * with the table-format pointer ([[requireAtomicRename]]);
  * `IndexCommitSpec` pins both the pass (file:) and the refusal
  * message.
  *
  * Concurrency model (round-12: the writer side is now built in):
  *
  *  - ONE WRITER at a time, enforced by a per-index-root WRITER LEASE
  *    (`<root>/_WRITER`): [[begin]] acquires it with the same
  *    write-then-verify + lease-steal machinery as the healing lock,
  *    [[commit]] releases it after apply retires the transaction, and
  *    [[abort]] releases it on the caller's early-out path. A second
  *    maintenance run on the same index WAITS for the holder (bounded
  *    by [[WriterWaitMs]], then fails loudly); a crashed writer's
  *    lease expires after [[WriterLeaseMs]] and is stolen — the
  *    stealer's [[begin]] heals the crashed transaction first, so the
  *    interleaved-staging corruption two unserialized writers could
  *    produce is structurally impossible. Long stage phases call
  *    [[Txn.heartbeat]] between staged writes to refresh the lease
  *    (and to detect theft EARLY); [[commit]] re-verifies ownership
  *    before publishing the marker, so a writer whose lease was stolen
  *    mid-stage aborts with the live tree untouched instead of
  *    committing over the thief.
  *  - READERS are concurrent with the writer and with each other, and
  *    probe-side healing is safe under that: [[recoverForRead]] rolls
  *    committed transactions FORWARD only — it never touches a
  *    marker-less staging dir, because "marker-less" cannot be
  *    distinguished from a LIVE writer mid-stage, and deleting a live
  *    staging would silently drop the writer's batch (staging is
  *    `_`-invisible to scans, so leaving it costs readers nothing;
  *    rollback belongs to the next writer's [[begin]], where the
  *    writer lease makes it safe).
  *  - Roll-forward itself serializes on a HEALING LOCK inside the txn
  *    dir: without it, two healers (two probes after a crash; or a
  *    probe racing the writer's own apply) can interleave
  *    delete(target)/rename(staged) and lose a partition. The writer
  *    takes the lock before publishing the marker, so a reader that
  *    sees the marker mid-apply WAITS for the txn dir to disappear
  *    instead of racing. Lock acquisition is a genuinely ATOMIC
  *    exclusive create per scheme (O_EXCL via java.nio on the local
  *    FS — Hadoop's local `create(overwrite=false)` is check-then-act;
  *    namenode/server-arbitrated creates on HDFS-like stores), and
  *    carries a LEASE: a lock older than `leaseMs` is presumed crashed
  *    and stolen via atomic rename (only one stealer wins). The apply
  *    loop REFRESHES the lock's mtime and RE-VERIFIES ownership
  *    before every destructive step, so a live-but-slow applier is
  *    never presumed dead while it works, and an applier whose lock
  *    WAS stolen (pathological lease expiry mid-apply) stops loudly
  *    before its next delete instead of interleaving with the thief.
  *
  * The op log is line-oriented `R<TAB>target<TAB>staged` /
  * `A<TAB>target<TAB>staged` with repo-controlled relative paths
  * (`band=…/bucket=…`, `cell=…`, txn-unique file names) — no escaping
  * needed, trivially replayable.
  *
  * Cost shape at scale: staging writes exactly the bytes the
  * non-atomic path wrote (touched partitions + the arriving batch);
  * commit adds one small file create + one rename; apply adds
  * O(touched) metadata renames plus one lock read+touch per op.
  * Nothing index-sized moves — a claim the capability gate keeps
  * honest per scheme. */
object IndexCommit {

  /** Staging root name — `_` prefix keeps it out of every Spark scan. */
  val TxnDirName = "_graft_txn"

  /** Healing-lock file name inside a txn dir (see object doc). */
  val HealLockName = "_HEALING"

  /** Writer-lease file name at the index root (see object doc). */
  val WriterLockName = "_WRITER"

  /** Schemes whose `rename` is an atomic O(1) metadata move — the two
    * properties the protocol is built on. Conservative by design: a
    * scheme not on this list fails fast (object doc) rather than
    * silently turning the commit point into a copy. */
  private val AtomicRenameSchemes =
    Set("file", "hdfs", "viewfs", "abfs", "abfss")

  /** Lease on a healing lock: a holder silent for this long is
    * presumed crashed and its lock is stolen. The apply loop touches
    * the lock's mtime on every op, so "silent" genuinely means dead —
    * a healthy applier is never presumed crashed no matter how long
    * its op list. `var` as a test seam (the [[killPoint]] precedent):
    * the kill-point spec compresses the lease to heal its own
    * same-JVM "crashes" immediately — never set outside specs. */
  private[graft] var HealLeaseMs: Long = 5 * 60 * 1000L

  /** Bound on waiting for a busy healer before failing loudly (same
    * test-seam discipline as [[HealLeaseMs]]). */
  private[graft] var HealWaitMs: Long = 60 * 1000L

  /** Lease on the per-index writer lock. Must out-live the longest gap
    * between lease touches — [[begin]], each [[Txn.heartbeat]], and
    * [[commit]] all refresh it, so the gap is one staged Spark write.
    * NOTE: writers that overlap a pair of staged writes (Par.two in
    * `maintainLshIndex` and friends) heartbeat AFTER the pair, so the
    * gap there is max(postings, vectors) rather than one write — the
    * lease term must exceed the longest single overlapped write-pair
    * side; `commit` re-verifies ownership before the atomic publish
    * either way. `var` as a test seam. */
  private[graft] var WriterLeaseMs: Long = 15 * 60 * 1000L

  /** Bound on waiting for a concurrent maintenance run to release the
    * writer lease before failing loudly. Production schedulers that
    * legitimately queue long compactions behind one another should
    * serialize upstream; this bound is the backstop that turns an
    * unexpected overlap into a visible error instead of a hang. */
  private[graft] var WriterWaitMs: Long = 60 * 1000L

  /** Fail fast on filesystems whose rename is not an atomic O(1) move
    * (object doc: the commit marker's atomicity and the cost claim
    * both die on object stores). Split out per scheme for the spec. */
  private[graft] def atomicRenameScheme(scheme: String): Boolean =
    AtomicRenameSchemes(scheme)

  private[graft] def requireAtomicRename(fs: FileSystem, root: Path): Unit = {
    val scheme = Option(root.toUri.getScheme).getOrElse(fs.getScheme)
    if (!atomicRenameScheme(scheme))
      throw new IllegalArgumentException(
        s"IndexCommit requires atomic O(1) rename and '$scheme://' does " +
          "not provide it: a directory rename there is a per-object COPY " +
          "(O(index bytes)) and the commit-marker rename decays to " +
          "copy+delete, losing the atomic commit point. Host the index " +
          "on an HDFS-like store (hdfs, viewfs, abfs) or local disk, or " +
          "use graft.store.ManifestStore, whose commit is one immutable " +
          "manifest-file publish (no directory moves) and which supports " +
          "object stores by design.")
  }

  /** Lease-carrying lock acquisition — the shared machinery behind
    * both the healing lock and the writer lease. Returns
    * Some(ownerToken) on acquisition; None when `stillNeeded` turns
    * false while waiting (the guarded resource was retired by a peer —
    * nothing left to do). Stale locks (older than `leaseMs`) are
    * stolen via atomic rename (one stealer wins; the winner deletes
    * the renamed-aside husk). Throws after `waitMs` if the lock stays
    * busy and fresh — a caller that can neither acquire nor steal must
    * not proceed.
    *
    * Acquisition is a genuinely ATOMIC exclusive create per scheme:
    * on `file:` Hadoop's `create(overwrite=false)` is check-then-act
    * (a >settle GC pause between one racer's existence check and its
    * write defeated the earlier 25 ms settle+read-back heuristic under
    * test-suite heap pressure — TWO owners), so the local path goes
    * through `java.nio.Files.createFile` (O_EXCL — OS-atomic); on the
    * HDFS-like schemes the capability gate admits, the namenode/server
    * arbitrates `create(overwrite=false)` and its result is trusted
    * directly. The token write lands AFTER
    * the claim; a concurrent content read in that window sees an empty
    * owner, which only the owner's own verify paths consult (they run
    * strictly after the write). */
  private[graft] def acquireLock(fs: FileSystem, lock: Path,
      stillNeeded: () => Boolean, leaseMs: Long, waitMs: Long)
      : Option[String] = {
    val me = java.util.UUID.randomUUID().toString
    val scheme = Option(lock.toUri.getScheme).getOrElse(fs.getScheme)
    val deadline = System.currentTimeMillis() + waitMs
    def claim(): Boolean =
      if (scheme == "file") {
        // OS-level O_EXCL create, then write the token through the
        // claimed handle's path
        try {
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(lock.toUri.getPath))
          val out = fs.create(lock, true)
          try out.write(me.getBytes("UTF-8")) finally out.close()
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false // parent gone: busy/retry
        }
      } else {
        try {
          val out = fs.create(lock, false)
          try out.write(me.getBytes("UTF-8")) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      }
    while (true) {
      if (!stillNeeded()) return None
      if (claim()) return Some(me)
      else {
        // busy: steal only a lease-expired lock (atomic rename — one
        // stealer wins), then loop back to a fresh acquisition attempt
        val stale =
          try {
            val st = fs.getFileStatus(lock)
            System.currentTimeMillis() - st.getModificationTime > leaseMs
          } catch { case _: java.io.IOException => false }
        if (stale) {
          val aside = new Path(lock.getParent,
            lock.getName + ".stale-" + me.take(8))
          try { if (fs.rename(lock, aside)) fs.delete(aside, false) }
          catch { case _: java.io.IOException => () }
        }
      }
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"lock ${lock.getName} busy past ${waitMs}ms at " +
            s"${lock.getParent} — the holder is alive (wait) or its " +
            "lease has not expired")
      Thread.sleep(50)
    }
    None // unreachable
  }

  /** Current owner token of a lock file; None when unreadable/absent. */
  private def lockOwner(fs: FileSystem, lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Refresh a held lock's mtime so the lease never expires under a
    * live holder (best-effort — a store without setTimes leaves the
    * lease as the only liveness signal, which the generous defaults
    * cover). */
  private def touchLock(fs: FileSystem, lock: Path): Unit =
    try fs.setTimes(lock, System.currentTimeMillis(), -1)
    catch { case _: java.io.IOException => () }

  private def writerLock(root: Path): Path = new Path(root, WriterLockName)

  private def acquireWriterLease(fs: FileSystem, root: Path): String =
    acquireLock(fs, writerLock(root), () => true, WriterLeaseMs,
      WriterWaitMs).getOrElse(throw new IllegalStateException(
      s"writer-lease acquisition under $root returned empty — " +
        "the index root cannot be retired"))

  /** Best-effort ownership-checked release: delete only a lock we
    * still own; a stolen lease belongs to the thief now (who is also
    * responsible for the index's consistency — their [[begin]] healed
    * our state before they proceeded). */
  private def releaseWriterLease(fs: FileSystem, root: Path,
      token: String): Unit = {
    val lock = writerLock(root)
    if (lockOwner(fs, lock).contains(token))
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () }
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
    * [[commit]] (or [[abort]] on an early-out). Carries the writer
    * lease token [[begin]] acquired. */
  final case class Txn(fs: FileSystem, root: Path, id: String,
      writerToken: String) {
    val dir: Path = new Path(new Path(root, TxnDirName), id)
    def stagingDir(rel: String): Path = new Path(dir, rel)

    /** Refresh the writer lease and verify it is still ours — call
      * between long staged writes so a healthy writer's lease never
      * expires mid-stage, and a writer whose lease WAS stolen (it
      * stalled past [[WriterLeaseMs]] without a heartbeat) finds out
      * here, with the live tree still untouched, instead of at
      * commit. */
    def heartbeat(): Unit = {
      val lock = writerLock(root)
      if (!lockOwner(fs, lock).contains(writerToken))
        throw new IllegalStateException(
          s"writer lease under $root was stolen (this run stalled past " +
            s"the ${WriterLeaseMs}ms lease) — aborting before touching " +
            "the live tree; the new writer healed this transaction away")
      touchLock(fs, lock)
    }
  }

  private def fsOf(s: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  /** Acquire the index's writer lease, heal, then open a fresh
    * transaction. Lease-before-heal is what makes the heal's rollback
    * of marker-less staging safe: holding the lease proves no OTHER
    * writer is live mid-stage (a crashed predecessor's lease was
    * stolen by this acquisition; a live one would have blocked it). */
  def begin(s: SparkSession, indexRoot: String): Txn = {
    val (fs, root) = fsOf(s, indexRoot)
    requireAtomicRename(fs, root)
    val token = acquireWriterLease(fs, root)
    try {
      recover(fs, root)
      val txn = Txn(fs, root,
        "txn-" + java.util.UUID.randomUUID().toString.take(13), token)
      require(fs.mkdirs(txn.dir), s"cannot create txn dir ${txn.dir}")
      txn
    } catch { case t: Throwable =>
      releaseWriterLease(fs, root, token); throw t
    }
  }

  /** Early-out for a transaction that staged nothing worth committing
    * (e.g. the caller discovered an empty effective batch after
    * [[begin]]): delete the staging, release the writer lease. The
    * live tree was never touched. */
  def abort(txn: Txn): Unit = {
    try txn.fs.delete(txn.dir, true)
    catch { case _: java.io.IOException => () }
    reapIfEmpty(txn.fs, new Path(txn.root, TxnDirName))
    releaseWriterLease(txn.fs, txn.root, txn.writerToken)
  }

  /** Cleanup for a maintenance run that FAILED with an exception (a
    * transient Spark error mid-stage, a kill signal that unwound the
    * stack) — as opposed to a process crash, where nothing runs and
    * the lease expires. Releasing promptly here is what keeps a flaky
    * batch from locking the index for a whole [[WriterLeaseMs]]:
    *
    *  - no commit marker yet → the failure predates the atomic point:
    *    pure rollback (staging deleted, live tree untouched, lease
    *    released) — the next run starts clean immediately;
    *  - marker PUBLISHED → the transaction is durable and MUST roll
    *    forward, never back: the txn dir is left for healing (the
    *    next writer's [[begin]] or any probe's [[recoverForRead]]
    *    completes it) and only the lease is released.
    *
    * Ownership-checked like every release — if the lease was already
    * stolen (the failure WAS a stall), nothing is touched. */
  def releaseOnFailure(txn: Txn): Unit = {
    val committed =
      try txn.fs.exists(new Path(txn.dir, "_COMMIT"))
      catch { case _: java.io.IOException => true } // unsure: keep the txn
    if (!committed)
      try txn.fs.delete(txn.dir, true)
      catch { case _: java.io.IOException => () }
    else {
      // the failed writer owns the txn's healing lock (it created it
      // pre-marker); releasing it here lets the NEXT healer roll the
      // durable txn forward immediately instead of waiting out the
      // heal lease on a lock whose holder is known-unwound
      val lock = new Path(txn.dir, HealLockName)
      if (lockOwner(txn.fs, lock).contains(txn.writerToken))
        try txn.fs.delete(lock, false)
        catch { case _: java.io.IOException => () }
    }
    reapIfEmpty(txn.fs, new Path(txn.root, TxnDirName))
    releaseWriterLease(txn.fs, txn.root, txn.writerToken)
  }

  /** Publish the commit marker (the atomic point), then apply + clean,
    * then release the writer lease. The lease is re-verified BEFORE
    * the marker: a writer that lost it mid-stage aborts here with the
    * live tree untouched (its staging was already healed away by the
    * thief). A crash anywhere before the marker rename leaves the live
    * tree untouched; anywhere after, [[recover]]/[[recoverForRead]]
    * completes the apply — the marker makes the transaction durable,
    * so the lease release only happens once apply retired it. The
    * writer takes the HEALING LOCK (content: its own lease token)
    * before publishing the marker, so a concurrent reader that sees
    * the marker waits out this apply instead of racing it. */
  def commit(txn: Txn, ops: Seq[Op]): Unit = {
    killPoint("staged")
    txn.heartbeat() // verify the lease is still ours; refresh it
    val lock = txn.fs.create(new Path(txn.dir, HealLockName), false)
    try lock.write(txn.writerToken.getBytes("UTF-8")) finally lock.close()
    val tmp = new Path(txn.dir, "_COMMIT.tmp")
    val out = txn.fs.create(tmp, true)
    try ops.foreach { op =>
      val tag = op match { case _: Replace => "R"; case _: Append => "A" }
      out.write(s"$tag\t${op.target}\t${op.staged}\n".getBytes("UTF-8"))
    } finally out.close()
    require(txn.fs.rename(tmp, new Path(txn.dir, "_COMMIT")),
      s"commit-marker rename failed under ${txn.dir}")
    killPoint("committed")
    apply(txn.fs, txn.root, txn.dir, ops, txn.writerToken)
    releaseWriterLease(txn.fs, txn.root, txn.writerToken)
  }

  /** Re-runnable apply: each op fires only if its staged source still
    * exists (rename is atomic per path, so "source gone" ⟺ "op done"),
    * and finishes by deleting the txn dir — marker included — which
    * retires the transaction. Before EVERY destructive step the healing
    * lock is re-read: ownership confirmed (a stolen lock stops this
    * applier loudly before it can interleave with the thief) and its
    * mtime refreshed (a live applier is never presumed dead, however
    * long the op list). A vanished txn dir means a peer completed the
    * whole apply — done, not an error. */
  private def apply(fs: FileSystem, root: Path, txnDir: Path,
      ops: Seq[Op], ownerToken: String): Unit = {
    val lock = new Path(txnDir, HealLockName)
    // true = proceed; false = a peer retired the txn (nothing left);
    // throws on theft — the ADVICE re-verify-before-delete contract
    def stillOwner(): Boolean = lockOwner(fs, lock) match {
      case Some(owner) if owner == ownerToken => touchLock(fs, lock); true
      case Some(_) => throw new IllegalStateException(
        s"healing lock under $txnDir was stolen mid-apply (this applier " +
          "stalled past the lease) — stopping before the next destructive " +
          "op; the thief owns the roll-forward now")
      case None =>
        if (!fs.exists(txnDir)) false // peer applied + retired the txn
        else throw new IllegalStateException(
          s"healing lock vanished under live txn $txnDir — refusing to " +
            "apply without serialization")
    }
    ops.zipWithIndex.foreach { case (op, i) =>
      val staged = new Path(txnDir, op.staged)
      val target = new Path(root, op.target)
      if (fs.exists(staged)) {
        if (!stillOwner()) return
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
    if (!stillOwner()) return
    fs.delete(txnDir, true)
    // reap the txn root with its last child (the .graft-scratch
    // discipline) so healthy indexes carry no empty litter
    reapIfEmpty(fs, txnDir.getParent)
  }

  /** WRITER-side heal as a standalone entry (maintenance code that
    * reads the live store before opening its own transaction): takes
    * the writer lease for the duration — rollback of marker-less
    * staging is only safe while no other writer can be mid-stage —
    * heals (no marker → roll BACK; marker → roll FORWARD through the
    * healing lock), and releases. Safe to call any time on a healthy
    * index (lease + no-op + release). [[begin]] performs the same heal
    * under the lease it keeps. */
  def recover(s: SparkSession, indexRoot: String,
      leaseMs: Long = HealLeaseMs, waitMs: Long = HealWaitMs): Unit = {
    val (fs, root) = fsOf(s, indexRoot)
    requireAtomicRename(fs, root)
    val token = acquireWriterLease(fs, root)
    try recover(fs, root, leaseMs, waitMs)
    finally releaseWriterLease(fs, root, token)
  }

  /** READER-side heal (probe lanes, before reading): rolls committed
    * transactions FORWARD only. Never deletes a marker-less staging —
    * a reader cannot distinguish "crashed pre-commit" from "live
    * writer mid-stage", and staging is scan-invisible anyway (object
    * doc). Takes no writer lease (readers are concurrent by design).
    * A healthy index pays one existence check. */
  def recoverForRead(s: SparkSession, indexRoot: String,
      leaseMs: Long = HealLeaseMs, waitMs: Long = HealWaitMs): Unit = {
    val (fs, root) = fsOf(s, indexRoot)
    requireAtomicRename(fs, root)
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

  /** Lease-protected internal heal — caller holds the writer lease. */
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
    * apply under the acquired token; if the txn dir disappeared while
    * waiting, a peer already retired it — done. The marker is
    * re-checked under the lock: the dir may have been replayed and
    * recreated between listing and locking. */
  private def rollForward(fs: FileSystem, root: Path, txnDir: Path,
      leaseMs: Long, waitMs: Long): Unit =
    acquireLock(fs, new Path(txnDir, HealLockName),
      () => fs.exists(txnDir), leaseMs, waitMs).foreach { token =>
      val marker = new Path(txnDir, "_COMMIT")
      if (fs.exists(marker)) apply(fs, root, txnDir, readOps(fs, marker), token)
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
