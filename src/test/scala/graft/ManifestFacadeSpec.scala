package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.ManifestStore

/** The SQL front door over the manifest store
  * ([[graft.sources.ManifestSource]]): `spark.read.format(
  * "graft-manifest")` must (a) return exactly the Scala API's rows,
  * (b) resolve to the REAL pruned multi-root parquet scan — not a
  * wrapper operator — so filters push down and columns prune, (c)
  * honor `version` time travel, and (d) stay correct on the
  * selections that cannot be one file relation (schema-evolved,
  * pruned-to-nothing) via the row-scan fallback. */
class ManifestFacadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  private def rows(ids: Range, tag: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, i % 4, s"$tag-$i")).toDF("id", "part", "v")
  }

  private def facade(root: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graft-manifest")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(root)

  test("facade read == Scala API read; the plan IS the pruned parquet " +
      "file scan; filters push down to the scan") {
    val root = tempDir("mff-plan")
    ManifestStore.create(spark, root, rows(0 until 40, "a"), "part")
    val viaApi = ManifestStore.read(spark, root, parts = Some(Seq("2")))
      .collect().map(_.toSeq).toSet
    val df = facade(root, "parts" -> "2")
    assert(df.collect().map(_.toSeq).toSet === viaApi)
    // manifest-level pruning happened before Spark listed anything:
    // only part=2 leaf dirs reach the scan
    assert(df.inputFiles.nonEmpty)
    assert(df.inputFiles.forall(_.contains("part__p=2")))
    // the executed plan is the native parquet FileScan (the facade
    // unwrapped to the file relation), with predicate pushdown intact
    val plan = df.filter(col("id") === 2L).queryExecution
      .executedPlan.toString
    assert(plan.contains("FileScan parquet"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2)"),
      plan)
  }

  test("version option time-travels; default reads the newest") {
    val root = tempDir("mff-travel")
    val base = rows(0 until 20, "a")
    ManifestStore.create(spark, root, base, "part")
    ManifestStore.upsertPartitions(spark, root,
      rows(20 until 30, "b"), "part")
    assert(facade(root, "version" -> "1").count() === 20)
    assert(facade(root).count() === 30)
    val e = intercept[IllegalArgumentException] {
      facade(root, "version" -> "9").collect()
    }
    assert(e.getMessage.contains("not retained"))
  }

  test("multi-table store: the table option selects; unknown loud") {
    import spark.implicits._
    val root = tempDir("mff-multi")
    ManifestStore.createTables(spark, root, Seq(
      (ManifestStore.TableDef("docs", ""),
        Seq((1L, "x"), (2L, "y")).toDF("id", "v")),
      (ManifestStore.TableDef("keyed", "part"),
        rows(0 until 8, "a"))))
    assert(facade(root, "table" -> "docs").count() === 2)
    assert(facade(root, "table" -> "keyed").count() === 8)
    val e = intercept[IllegalArgumentException] {
      facade(root, "table" -> "nope").collect()
    }
    assert(e.getMessage.contains("no table"))
  }

  test("evolved and empty selections fall back correctly: unioned " +
      "rows with the union schema; empty frame with the union schema") {
    import spark.implicits._
    val root = tempDir("mff-evolved")
    ManifestStore.create(spark, root,
      Seq((1L, 0, "a"), (2L, 1, "b")).toDF("id", "part", "v"), "part")
    ManifestStore.upsertPartitions(spark, root,
      Seq((3L, 0, "c", 9.5)).toDF("id", "part", "v", "score"), "part")
    val evolved = facade(root)
    assert(evolved.columns.toSet === Set("id", "part", "v", "score"))
    assert(evolved.count() === 3)
    assert(evolved.filter(col("score").isNotNull).count() === 1)
    val empty = facade(root, "parts" -> "99")
    assert(empty.count() === 0)
    assert(empty.columns.toSet === Set("id", "part", "v", "score"))
  }

  test("mf_facade_time_travel gate: v1 replays the raw aggregate, v2 " +
      "shows the replaced partition doubled, others untouched") {
    val got = graft.operators.Layout.manifestFacadeTimeTravel(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val raw = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(graft.operators.Relational.dsum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = raw.keys.toSeq.sorted.map(f => (1, f, raw(f))) ++
      raw.keys.toSeq.sorted.map(f =>
        (2, f, if (f == "A") raw(f) * 2 else raw(f)))
    assert(got.toSeq === want)
  }

  test("mf_facade_read gate: the spark.sql aggregate through the view " +
      "equals the direct aggregate under the equivalent IN filter") {
    val got = graft.operators.Layout.manifestFacadeRead(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag").isin("A", "N"))
      .groupBy("l_returnflag")
      .agg(graft.operators.Relational.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._1).toSeq === Seq("A", "N")) // pruning value-visible
  }
}
