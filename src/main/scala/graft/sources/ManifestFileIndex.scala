package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex,
  PartitionDirectory}
import org.apache.spark.sql.types.{ByteType, DataType, DateType,
  IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.store.ManifestStore
import graft.store.ManifestStore.Entry

/** The manifest store's answer to Spark's file listing — a [[FileIndex]]
  * whose "directory listing" IS the manifest (the Delta/Iceberg
  * architecture, library-sized). [[ManifestSource]] hands this to a
  * real `HadoopFsRelation`, so the facade's plan is the native parquet
  * `FileScan` — whole-stage codegen, predicate pushdown, column
  * pruning — while partition resolution never touches the filesystem's
  * directory tree:
  *
  *  - the table's partition KEY is declared as a partition column
  *    (`partitionSchema`), so `FileSourceStrategy` routes every
  *    key predicate of a plain `WHERE` into `listFiles`'
  *    `partitionFilters` — MANIFEST-level pruning driven by SQL, no
  *    `parts` option needed. Dynamic partition pruning composes on
  *    top for free (Spark applies runtime filters to the
  *    [[PartitionDirectory]] values this index returns);
  *  - listing is LAZY and per-partition: only partitions surviving the
  *    predicate have their (single) leaf dir listed — at 100 TB on an
  *    object store a selective facade query issues list calls for the
  *    probed partitions ONLY, the same zero-irrelevant-prefixes
  *    contract the Scala API's `parts` pruning states;
  *  - for `keyInData` tables the key stays in its original schema
  *    position (`HadoopFsRelation` overlays the partition column onto
  *    the same-named data column), and the scan no longer reads the
  *    key's bytes from the files at all — the manifest supplies the
  *    value, a free column prune. For layout-only-key tables the key
  *    is RESTORED as a string partition column the Scala read cannot
  *    offer (it was never stored in the files);
  *  - `version`/`parts` options compose: the entry set this index is
  *    built over is already time-travel-resolved and option-pruned.
  *
  * Beyond key pruning, `listFiles` intersects its DATA filters with
  * the manifest's per-segment column stats
  * ([[graft.store.ManifestStore.ColStat]]): segments provably outside
  * a selective non-key predicate's range are skipped before their dir
  * is listed or a footer opened — Delta-style file skipping, driven
  * entirely by manifest metadata. `sizeInBytes` is exact and
  * list-free from the entries' staged byte sizes (v3 manifests); for
  * pre-v3 entries it reports the session's conservative default
  * (never a broadcast-underestimate). A schema-fingerprint-
  * heterogeneous selection cannot be one file relation and stays on
  * [[ManifestSource]]'s fallback scan until CompactAppend /
  * full-partition rewrites retire the evolution debt.
  *
  * Key-domain contract: partition keys render verbatim
  * ([[graft.store.ManifestStore]]'s write-time guards), so parsing the
  * hive rendering back to the key type is exact for the supported key
  * types ([[ManifestFileIndex.supportedKeyType]]); unsupported key
  * types fall back to the non-indexed relation in [[ManifestSource]].
  */
private[graft] final class ManifestFileIndex(
    spark: SparkSession,
    fs: FileSystem,
    storeRoot: Path,
    keyCol: String, // "" = append-only: no partition column, one group
    keyType: DataType,
    entries: Seq[Entry]) extends FileIndex {

  /** part → its entries (one per manifest contract for keyed tables,
    * every append segment under part "" for append-only ones), sorted
    * for deterministic listings. */
  private val byPart: Seq[(String, Seq[Entry])] =
    entries.groupBy(_.part).view.mapValues(_.sortBy(_.dir))
      .toSeq.sortBy(_._1)

  /** Last `listFiles` partition selection — an observability seam for
    * the pruning gates/specs (never read by the scan itself). */
  @volatile private[graft] var lastSelectedParts: Option[Seq[String]] = None

  override val partitionSchema: StructType =
    if (keyCol.isEmpty) StructType(Nil)
    else StructType(Seq(StructField(keyCol, keyType, nullable = false)))

  /** DELIBERATELY two paths. Spark's `DataSourceAnalysis` refuses
    * `INSERT INTO`/`INSERT OVERWRITE` on any multi-path relation AT
    * ANALYSIS TIME (`UNSUPPORTED_INSERT.MULTI_PATH`) — which matters
    * because `InsertIntoHadoopFsRelationCommand` DELETES the output
    * path for a static overwrite BEFORE its first write step: with a
    * single root, `INSERT OVERWRITE facade_view` would wipe the store
    * root before [[ManifestReadOnlyParquetFormat]]'s `prepareWrite`
    * refusal could fire. Both paths are real store directories;
    * nothing on the read path consumes `rootPaths` beyond explain
    * metadata. */
  override def rootPaths: Seq[Path] =
    Seq(storeRoot, new Path(storeRoot, ManifestStore.ManifestDirName))

  // listing cache keyed by entry DIR (not part): data-filter skipping
  // selects entries within a part, so the cached unit must be the
  // entry's own leaf
  private val listed = new ConcurrentHashMap[String, Array[FileStatus]]()

  private def filesOf(e: Entry): Array[FileStatus] =
    listed.computeIfAbsent(e.dir, _ =>
      fs.listStatus(new Path(storeRoot, e.dir)).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      })

  private def partValueOf(part: String): Any =
    ManifestFileIndex.parseKey(part, keyType)

  private def valuesOf(part: String): InternalRow =
    if (keyCol.isEmpty) InternalRow.empty
    else InternalRow(partValueOf(part))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keyPruned =
      if (partitionFilters.isEmpty || keyCol.isEmpty) byPart
      else {
        // bind the key attribute to slot 0 of a one-column row and
        // evaluate the conjunction against each part's parsed value —
        // the standard PartitioningAwareFileIndex pruning shape
        val bound = partitionFilters.reduce(And).transform {
          case _: AttributeReference =>
            BoundReference(0, keyType, nullable = false)
        }
        val pred = Predicate.create(bound)
        pred.initialize(0)
        byPart.filter { case (p, _) =>
          pred.eval(InternalRow(partValueOf(p)))
        }
      }
    // data filters intersect the entries' column stats (the manifest's
    // per-segment min/max): a segment provably outside every filter's
    // range is dropped here, BEFORE its dir is ever listed — the
    // Delta-style file skipping, I/O-only (Spark still applies the
    // filters to the rows the surviving files produce)
    val sourceFilters =
      dataFilters.flatMap(ManifestFileIndex.toSourceFilter)
    val selected = keyPruned.flatMap { case (p, es) =>
      val kept =
        if (sourceFilters.isEmpty) es
        else es.filter(e =>
          sourceFilters.forall(f => ManifestStore.mayMatch(e.stats, f)))
      if (kept.isEmpty) None else Some((p, kept))
    }
    lastSelectedParts = Some(selected.map(_._1))
    selected.map { case (p, es) =>
      PartitionDirectory(valuesOf(p), es.flatMap(filesOf(_)).toArray)
    }
  }

  override def inputFiles: Array[String] =
    entries.flatMap(e => filesOf(e).map(_.getPath.toString)).toArray

  override def refresh(): Unit = listed.clear()

  /** Exact with ZERO list calls when every entry carries its staged
    * byte size (v3 manifests do); the conservative session default
    * otherwise — a facade relation must never under-report and get
    * itself broadcast at 100 TB. */
  override def sizeInBytes: Long =
    if (entries.forall(_.bytes >= 0L)) entries.map(_.bytes).sum
    else spark.sessionState.conf.defaultSizeInBytes
}

private[graft] object ManifestFileIndex {

  /** Key types whose hive rendering parses back EXACTLY under the
    * store's verbatim-rendering guards. Anything else (decimal, float
    * formatting, timestamp — which the guards refuse anyway for its
    * colons) keeps the facade on the fallback relation. */
  def supportedKeyType(t: DataType): Boolean = t match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
        DateType => true
    case _ => false
  }

  /** Catalyst → data-source filter translation for the shapes the
    * stat-skip evaluator ([[ManifestStore.mayMatch]]) understands —
    * hand-rolled because Spark's `DataSourceStrategy.translateFilter`
    * is `protected[sql]`. Internal literal values convert to their
    * external renderings (UTF8String → String, epoch-day → LocalDate,
    * micros → Instant) so `mayMatch` compares in one domain.
    * Untranslatable shapes yield None — conservative, never-skip. */
  private[sources] def toSourceFilter(e: org.apache.spark.sql.catalyst
      .expressions.Expression): Option[org.apache.spark.sql.sources
      .Filter] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.{sources => sf}
    import org.apache.spark.sql.types._
    def ext(v: Any, t: DataType): Option[Any] = Option(v).flatMap { _ =>
      t match {
        case StringType => Some(v.toString)
        case DateType =>
          Some(java.time.LocalDate.ofEpochDay(
            v.asInstanceOf[Int].toLong))
        case TimestampType | TimestampNTZType =>
          val us = v.asInstanceOf[Long]
          Some(java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L))
        case _: DecimalType =>
          Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
            .toJavaBigDecimal)
        case ByteType | ShortType | IntegerType | LongType | FloatType |
            DoubleType => Some(v)
        case _ => None
      }
    }
    def lit(x: ce.Expression): Option[Any] = x match {
      case l: ce.Literal => ext(l.value, l.dataType)
      case _ => None
    }
    e match {
      case ce.And(l, r) => for {
        a <- toSourceFilter(l); b <- toSourceFilter(r)
      } yield sf.And(a, b)
      case ce.Or(l, r) => for {
        a <- toSourceFilter(l); b <- toSourceFilter(r)
      } yield sf.Or(a, b)
      case ce.EqualTo(a: ce.AttributeReference, v) =>
        lit(v).map(sf.EqualTo(a.name, _))
      case ce.EqualTo(v, a: ce.AttributeReference) =>
        lit(v).map(sf.EqualTo(a.name, _))
      case ce.GreaterThan(a: ce.AttributeReference, v) =>
        lit(v).map(sf.GreaterThan(a.name, _))
      case ce.GreaterThan(v, a: ce.AttributeReference) =>
        lit(v).map(sf.LessThan(a.name, _))
      case ce.GreaterThanOrEqual(a: ce.AttributeReference, v) =>
        lit(v).map(sf.GreaterThanOrEqual(a.name, _))
      case ce.GreaterThanOrEqual(v, a: ce.AttributeReference) =>
        lit(v).map(sf.LessThanOrEqual(a.name, _))
      case ce.LessThan(a: ce.AttributeReference, v) =>
        lit(v).map(sf.LessThan(a.name, _))
      case ce.LessThan(v, a: ce.AttributeReference) =>
        lit(v).map(sf.GreaterThan(a.name, _))
      case ce.LessThanOrEqual(a: ce.AttributeReference, v) =>
        lit(v).map(sf.LessThanOrEqual(a.name, _))
      case ce.LessThanOrEqual(v, a: ce.AttributeReference) =>
        lit(v).map(sf.GreaterThanOrEqual(a.name, _))
      case ce.In(a: ce.AttributeReference, vs) =>
        val ex = vs.map(lit)
        if (ex.forall(_.isDefined)) Some(sf.In(a.name,
          ex.map(_.get).toArray))
        else None
      case ce.InSet(a: ce.AttributeReference, set) =>
        val ex = set.toSeq.map(v => ext(v, a.dataType))
        if (ex.forall(_.isDefined)) Some(sf.In(a.name,
          ex.map(_.get).toArray))
        else None
      case _ => None
    }
  }

  private[sources] def parseKey(part: String, t: DataType): Any = t match {
    case StringType => UTF8String.fromString(part)
    case IntegerType => part.toInt
    case LongType => part.toLong
    case ShortType => part.toShort
    case ByteType => part.toByte
    case DateType => java.time.LocalDate.parse(part).toEpochDay.toInt
    case other => throw new IllegalStateException(
      s"unsupported manifest key type $other — guarded by supportedKeyType")
  }
}
