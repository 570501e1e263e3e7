package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-manifest table layout — the "table-format answer" the
  * [[IndexCommit]] protocol's scaladoc points at, built library-sized.
  *
  * [[IndexCommit]] mutates a live tree in place behind a redo-logged
  * transaction; its commit point is an atomic file RENAME and its apply
  * phase MOVES partition directories. That buys crash-atomicity for
  * heal-then-scan readers, but two limits are structural:
  *
  *  - a scan already in flight during the apply can observe a partition
  *    mid-swap (absent / FileNotFound) — the same window Spark's own
  *    dynamic partition overwrite has;
  *  - the protocol dies on flat-namespace object stores (`s3a`/`gs`),
  *    where rename is a per-object COPY and the marker rename loses its
  *    atomicity — hence IndexCommit's fail-fast capability gate.
  *
  * This module removes both by never mutating published data at all
  * (the Iceberg/Delta idea, reduced to what an index store needs):
  *
  * {{{
  *   <root>/_manifests/v00000001.mf     immutable, line-oriented
  *   <root>/_manifests/v00000002.mf
  *   <root>/seg/<segId>/<part>=<v>/...  immutable data segments
  *   <root>/_WRITER                     writer lease (IndexCommit's
  *                                      lock machinery, same seams)
  * }}}
  *
  * A manifest file IS a table version: the authoritative list of
  * (partition value → segment leaf directory) making up that snapshot.
  * Writers stage a new immutable segment (only the touched partitions'
  * merged rows), then publish manifest N+1 = untouched entries of N ++
  * the new entries. NOTHING published is ever renamed, moved, or
  * deleted by a commit — the commit point is the APPEARANCE of the
  * `vN+1.mf` key, which is atomic on every store this library meets:
  * one small-file rename on rename-atomic schemes, and a single PUT on
  * object stores (an object is invisible until its PUT completes, and
  * the only rename here is of one manifest-sized file, never data).
  * There is deliberately NO [[IndexCommit.requireAtomicRename]] gate.
  *
  * What readers get, stated precisely:
  *
  *  - SNAPSHOT ISOLATION, lock-free: a reader resolves the newest
  *    manifest once and scans immutable directories. A concurrent
  *    commit cannot perturb it — there is no mid-swap window to
  *    observe, which retires the in-flight-scan caveat IndexCommit has
  *    to document. No reader-side healing exists because none is
  *    needed: a writer crash before the manifest create leaves only an
  *    unreferenced segment (invisible; [[vacuum]] reaps it), and after
  *    the create the commit is simply durable.
  *  - TIME TRAVEL: any retained version is readable (`version =`),
  *    because old manifests and the segments they reference stay put
  *    until [[vacuum]] retires them past the retention horizon.
  *  - MANIFEST-LEVEL PRUNING: the probe lanes pass the partition
  *    values they need and only those leaf dirs reach the scan — at
  *    100 TB on an object store that means ZERO list calls over
  *    irrelevant prefixes (cheaper than hive-layout listing + DPP,
  *    which must at least enumerate the partition dirs). The partition
  *    column is DUPLICATED into the data files (`partCol__p=` carries
  *    the layout, `partCol` stays a data column), so a multi-root scan
  *    keeps the column without partition-inference over a shared base
  *    path; the duplication costs one small column, dwarfed by the
  *    embedding payloads these stores hold.
  *
  * Concurrency: ONE writer at a time via the same per-root writer
  * lease as [[IndexCommit]] (write-then-verify, lease-steal, the
  * `WriterLeaseMs`/`WriterWaitMs` seams). The manifest create is the
  * backstop: it refuses to overwrite an existing version file, so even
  * a pathological double-grant cannot silently drop a commit — the
  * loser fails loudly. [[vacuum]] runs under the same lease, which is
  * what makes "unreferenced segment" mean "dead" (no writer can be
  * mid-stage while the lease is held); retention (`keepLast`) is the
  * reader contract — vacuum only against a horizon older than the
  * longest-running scan, exactly Delta's VACUUM discipline.
  *
  * Cost shape at scale: a commit writes the touched partitions' bytes
  * (the same bytes IndexCommit staged) plus ONE manifest file — O(live
  * partitions) lines of driver-side metadata, no data moves, no apply
  * phase, no healing. Reads pay one small-file GET to resolve the
  * newest manifest. Manifest size is the honest limit: at millions of
  * partitions a real table format's manifest TREES take over; the
  * index stores here hold k-to-thousands of cells/buckets.
  *
  * Partition values must be non-null and are keyed by their hive
  * directory rendering (for the integer cell/bucket keys the ANN lanes
  * use, that is the plain decimal string). */
object ManifestStore {

  /** One manifest line: partition value (hive dir rendering) → leaf
    * data dir, relative to the store root. */
  final case class Entry(part: String, dir: String)

  /** A parsed manifest: the partition column it is keyed by and the
    * full entry list of that version. */
  final case class Manifest(partCol: String, entries: Seq[Entry])

  private val ManifestDirName = "_manifests"
  private val SegDirName = "seg"
  private val Header = "graft-manifest"

  /** Kill-point hook for the crash spec — same seam discipline as
    * [[IndexCommit.killPoint]]: "staged" fires after the new segment is
    * fully written (manifest not yet published), "committed" after the
    * manifest create. Never set outside specs. */
  private[graft] var killPoint: String => Unit = _ => ()

  private def fsOf(s: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  private def manifestDir(root: Path) = new Path(root, ManifestDirName)
  private def manifestPath(root: Path, v: Long) =
    new Path(manifestDir(root), f"v$v%08d.mf")
  private def writerLock(root: Path) =
    new Path(root, IndexCommit.WriterLockName)

  private def acquireLease(fs: FileSystem, root: Path): String = {
    // a fresh store root may not exist yet (create()'s first act is
    // taking the lease) — the lock file needs its parent in place
    if (!fs.exists(root)) fs.mkdirs(root)
    IndexCommit.acquireLock(fs, writerLock(root), () => true,
      IndexCommit.WriterLeaseMs, IndexCommit.WriterWaitMs)
      .getOrElse(throw new IllegalStateException(
        s"writer-lease acquisition under $root returned empty — " +
          "the store root cannot be retired"))
  }

  private def releaseLease(fs: FileSystem, root: Path,
      token: String): Unit = {
    val lock = writerLock(root)
    val owner =
      try {
        val in = fs.open(lock)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      } catch { case _: java.io.IOException => None }
    if (owner.contains(token))
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () }
  }

  /** Newest committed version under `root`; None when the store has no
    * manifest yet (not initialized, or a crash preceded [[create]]'s
    * commit point). */
  def currentVersion(s: SparkSession, root: String): Option[Long] = {
    val (fs, r) = fsOf(s, root)
    currentVersion(fs, r)
  }

  private def listVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val dir = manifestDir(root)
    val sts =
      try { if (fs.exists(dir)) fs.listStatus(dir) else return Seq.empty }
      catch { case _: java.io.FileNotFoundException => return Seq.empty }
    sts.iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".mf"))
      .map(n => n.stripPrefix("v").stripSuffix(".mf").toLong)
      .toSeq.sorted
  }

  private def currentVersion(fs: FileSystem, root: Path): Option[Long] =
    listVersions(fs, root).lastOption

  /** All retained (readable, time-travelable) versions, ascending. */
  def versions(s: SparkSession, root: String): Seq[Long] = {
    val (fs, r) = fsOf(s, root)
    listVersions(fs, r)
  }

  private def readManifest(fs: FileSystem, root: Path, v: Long): Manifest = {
    val p = manifestPath(root, v)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val partCol = lines.headOption match {
      case Some(h) => h.split('\t') match {
        case Array(Header, "1", pc) => pc
        case _ => throw new IllegalStateException(
          s"corrupt manifest header in $p: $h")
      }
      case None => throw new IllegalStateException(s"empty manifest $p")
    }
    val entries = lines.tail.map { line =>
      line.split('\t') match {
        case Array("E", part, dir) => Entry(part, dir)
        case _ => throw new IllegalStateException(
          s"corrupt manifest line in $p: $line")
      }
    }
    Manifest(partCol, entries)
  }

  /** Publish version `v`: write the manifest body to a dot-invisible
    * temp name and rename it to `v%08d.mf`. The appearance of the final
    * key IS the commit point (object doc); the pre-existence check plus
    * rename-refuses-to-overwrite is the double-writer backstop. */
  private def writeManifest(fs: FileSystem, root: Path, v: Long,
      partCol: String, entries: Seq[Entry]): Unit = {
    val dir = manifestDir(root)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val fin = manifestPath(root, v)
    require(!fs.exists(fin),
      s"manifest $fin already exists — a concurrent writer committed " +
        "this version (the writer lease should have prevented this)")
    val tmp = new Path(dir, f".v$v%08d.mf.tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try {
      out.write(s"$Header\t1\t$partCol\n".getBytes("UTF-8"))
      entries.sortBy(e => (e.part, e.dir)).foreach { e =>
        out.write(s"E\t${e.part}\t${e.dir}\n".getBytes("UTF-8"))
      }
    } finally out.close()
    require(fs.rename(tmp, fin),
      s"manifest publish rename $tmp -> $fin failed (concurrent commit?)")
  }

  /** Write `df` as a fresh immutable segment, hive-partitioned by a
    * DUPLICATE of `partCol` so the values stay data columns (object
    * doc), and return the manifest entries its leaf dirs become. */
  private def writeSegment(s: SparkSession, fs: FileSystem, root: Path,
      df: DataFrame, partCol: String): Seq[Entry] = {
    val layoutCol = partCol + "__p"
    val segRel = s"$SegDirName/seg-" +
      java.util.UUID.randomUUID().toString.take(13)
    val segPath = new Path(root, segRel)
    df.withColumn(layoutCol, col(partCol))
      .repartition(col(partCol)) // one writer task per touched partition
      .write.mode("errorifexists").partitionBy(layoutCol)
      .option("compression", "zstd")
      .parquet(segPath.toString)
    fs.listStatus(segPath).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(layoutCol + "="))
      .map { st =>
        val name = st.getPath.getName
        Entry(name.stripPrefix(layoutCol + "="), s"$segRel/$name")
      }
      .sortBy(_.part)
  }

  /** Initialize a manifest store at `root` from `df`, keyed by
    * `partCol`. Returns the committed version (always 1). Fails loudly
    * on an already-initialized root — re-creation is a destructive
    * intent this API refuses to guess at. */
  def create(s: SparkSession, root: String, df: DataFrame,
      partCol: String): Long = {
    val (fs, r) = fsOf(s, root)
    require(currentVersion(fs, r).isEmpty,
      s"manifest store at $root is already initialized — upsert into " +
        "it, or point create() at a fresh root")
    val token = acquireLease(fs, r)
    try {
      val entries = writeSegment(s, fs, r, df, partCol)
      killPoint("staged")
      writeManifest(fs, r, 1L, partCol, entries)
      killPoint("committed")
      1L
    } finally releaseLease(fs, r, token)
  }

  /** Merge `arriving` into the store: the touched partitions (the
    * distinct `partCol` values of the batch — bounded metadata, the
    * [[graft.operators.Similarity.ivfCompact]] asymmetry) are read
    * back MANIFEST-PRUNED, merged with the batch, and written as a new
    * immutable segment; version N+1 keeps every untouched entry of N
    * by reference. Per-batch work scales with the batch and the
    * partitions it lands in, never with store size — and nothing
    * published moves.
    *
    * `idCol`: when set, live rows of the touched partitions whose id
    * appears in the batch are REPLACED, not duplicated (anti-join on
    * the touched slice) — merge∘merge = merge under re-delivery, the
    * same contract as `ivfCompact(upsertById)`.
    *
    * An empty batch commits nothing and bumps no version. Returns the
    * touched partition keys (hive rendering, sorted). */
  def upsertPartitions(s: SparkSession, root: String, arriving: DataFrame,
      partCol: String, idCol: Option[String] = None): Seq[String] = {
    val (fs, r) = fsOf(s, root)
    val touched = arriving.select(partCol).distinct()
      .collect().map(_.get(0).toString).toSeq.sorted
    if (touched.isEmpty) return Seq.empty
    val token = acquireLease(fs, r)
    try {
      val v = currentVersion(fs, r).getOrElse(
        throw new IllegalStateException(
          s"manifest store at $root is not initialized — create() first"))
      val m = readManifest(fs, r, v)
      require(m.partCol == partCol,
        s"store at $root is keyed by '${m.partCol}', not '$partCol'")
      val touchedSet = touched.toSet
      val (touchedE, untouchedE) =
        m.entries.partition(e => touchedSet.contains(e.part))
      val cols = arriving.columns.map(col)
      val merged =
        if (touchedE.isEmpty) arriving
        else {
          val live = s.read.parquet(
            touchedE.map(e => new Path(r, e.dir).toString): _*)
          val kept = idCol.fold(live)(id =>
            live.join(arriving.select(id), Seq(id), "left_anti"))
          kept.select(cols: _*).unionByName(arriving.select(cols: _*))
        }
      val newEntries = writeSegment(s, fs, r, merged, partCol)
      killPoint("staged")
      writeManifest(fs, r, v + 1, partCol, untouchedE ++ newEntries)
      killPoint("committed")
      touched
    } finally releaseLease(fs, r, token)
  }

  /** Snapshot read. `parts` prunes at the MANIFEST level — only the
    * named partitions' leaf dirs reach the scan (object doc); `version`
    * time-travels to any retained manifest. A pruned read matching
    * nothing returns an empty frame with the store's schema. */
  def read(s: SparkSession, root: String,
      parts: Option[Seq[String]] = None,
      version: Option[Long] = None): DataFrame = {
    val (fs, r) = fsOf(s, root)
    val v = version.getOrElse(currentVersion(fs, r).getOrElse(
      throw new IllegalStateException(
        s"manifest store at $root has no committed version")))
    require(listVersions(fs, r).contains(v),
      s"version $v of $root is not retained (vacuumed, or never " +
        s"committed) — retained: ${listVersions(fs, r).mkString(",")}")
    val m = readManifest(fs, r, v)
    require(m.entries.nonEmpty, s"manifest v$v at $root lists no data")
    val sel = parts.fold(m.entries)(ps =>
      m.entries.filter(e => ps.contains(e.part)))
    if (sel.isEmpty)
      s.read.parquet(new Path(r, m.entries.head.dir).toString)
        .filter(lit(false))
    else
      s.read.parquet(sel.map(e => new Path(r, e.dir).toString): _*)
  }

  /** Retire history: keep the newest `keepLast` manifests, delete the
    * older ones, then delete every segment LEAF dir no kept manifest
    * references (which also reaps crashed writers' orphan segments —
    * safe because the writer lease is held, so no live writer can be
    * mid-stage). Empty segment parents are reaped. Returns the deleted
    * paths (manifests + leaf dirs), for the caller's audit log.
    *
    * Retention is the reader contract: a scan of version V stays valid
    * until vacuum drops V — run vacuum only against a horizon older
    * than the longest-running read, as with any snapshot store. */
  def vacuum(s: SparkSession, root: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "vacuum must keep at least the newest version")
    val (fs, r) = fsOf(s, root)
    val token = acquireLease(fs, r)
    try {
      val vs = listVersions(fs, r)
      val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
      val referenced: Set[String] =
        keep.flatMap(v => readManifest(fs, r, v).entries.map(_.dir)).toSet
      val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
      drop.foreach { v =>
        val p = manifestPath(r, v)
        if (fs.delete(p, false)) deleted += p.toString
      }
      val segRoot = new Path(r, SegDirName)
      val segs =
        try { if (fs.exists(segRoot)) fs.listStatus(segRoot) else Array.empty[org.apache.hadoop.fs.FileStatus] }
        catch { case _: java.io.FileNotFoundException =>
          Array.empty[org.apache.hadoop.fs.FileStatus] }
      segs.filter(_.isDirectory).foreach { seg =>
        val segRel = s"$SegDirName/${seg.getPath.getName}"
        fs.listStatus(seg.getPath).foreach { leaf =>
          val rel = s"$segRel/${leaf.getPath.getName}"
          if (!referenced.contains(rel) && fs.delete(leaf.getPath, true))
            deleted += leaf.getPath.toString
        }
        // reap a now-empty segment dir (best-effort)
        try {
          if (fs.listStatus(seg.getPath).isEmpty)
            fs.delete(seg.getPath, false)
        } catch { case _: java.io.IOException => () }
      }
      deleted.toSeq
    } finally releaseLease(fs, r, token)
  }
}
