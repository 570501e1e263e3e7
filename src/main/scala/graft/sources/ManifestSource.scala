package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft-manifest")` — the SQL-facing read facade
  * over [[graft.store.ManifestStore]], so `spark.sql` users get the
  * store's snapshot reads, manifest-level pruning, and time travel
  * without touching the Scala API:
  *
  * {{{
  *   spark.read.format("graft-manifest")
  *     .option("table", "postings")     // default "t" (single-table)
  *     .option("version", 3)            // default: newest
  *     .option("parts", "0_1,0_2")      // manifest-level pruning
  *     .load(rootPath)
  *     .createOrReplaceTempView("postings_v3")
  * }}}
  *
  * Deliberately a DataSource V1 [[RelationProvider]], not a V2
  * `TableProvider`: V1's contract lets the facade RETURN the
  * underlying file relation, so for the common (schema-homogeneous)
  * selection the query plan IS the pruned multi-root parquet
  * `FileScan` — filters push down to parquet, columns prune, and
  * whole-stage codegen applies, exactly as if the caller had listed
  * the manifest's leaf dirs by hand. A custom V2 Scan would interpose
  * its own row-producing operator and surrender the native columnar
  * scan path for zero functional gain. Version resolution and
  * manifest pruning happen ONCE, at relation creation (driver-side
  * metadata) — the snapshot a view captures stays stable under
  * concurrent commits, the store's isolation contract.
  *
  * A selection spanning DISAGREEING schema fingerprints (an evolved
  * table mid-compaction) or pruned to nothing cannot be one file
  * relation; those fall back to a [[TableScan]] delegating to
  * [[graft.store.ManifestStore.readTable]]'s unioned/emptied frame —
  * correct rows, plain row-based scan, and retired by the same
  * CompactAppend / full-partition rewrite that retires the evolution
  * debt itself. Write paths stay on the Scala API on purpose: commits
  * need the planning closure + writer lease, which a blind
  * `df.write.format(...)` cannot express. */
class ManifestSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = ctx.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-manifest needs the store root: .load(<root>) or " +
          "option(\"path\", <root>)"))
    val table = parameters.getOrElse("table", "t")
    val version = parameters.get("version").map(_.toLong)
    val parts = parameters.get("parts")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean)
    val df = graft.store.ManifestStore.readTable(spark, root, table,
      parts, version, mergeSchema)
    df.queryExecution.analyzed match {
      // the homogeneous fast path: hand Spark the real file relation
      case lr: LogicalRelation => lr.relation
      // evolved / empty selections: delegate to the store's frame
      case _ => ManifestFrameRelation(df)
    }
  }
}

/** Fallback relation for selections [[ManifestSource]] cannot express
  * as one file relation (fingerprint-heterogeneous or empty): a plain
  * [[TableScan]] over the store's already-correct frame. */
private[sources] final case class ManifestFrameRelation(df: DataFrame)
    extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = df.sparkSession.sqlContext
  override def schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
}
