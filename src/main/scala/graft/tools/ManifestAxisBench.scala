package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.ManifestStore

/** Rehearse the manifest store on the VERSION axis — the round-12
  * verdict's open evidence item: the 30× data-axis numbers are strong,
  * but nothing measured MANY COMMITS. A production streaming
  * maintenance loop lands one commit per micro-batch, so the store
  * must stay flat (or documented-linear) in version count across
  * hundreds of commits, with and without the periodic CompactAppend +
  * vacuum discipline.
  *
  * Three scenarios, 100 commits each, fresh store per scenario:
  *
  *  - `append-raw`: 100 small Appends, NO maintenance — the worst
  *    case: entries grow linearly (one per commit), every read merges
  *    100 segment footers, manifests grow linearly.
  *  - `append-maintained`: same appends, but every 10th commit also
  *    runs CompactAppend + vacuum(keepLast=5) — the documented
  *    production discipline; entries and manifest size stay bounded.
  *  - `upsert-16cell`: 100 partitioned upserts into a 16-cell store
  *    (the IVF streaming-maintenance shape) — entries are O(live
  *    partitions) = 16 regardless of commit count; only the manifest
  *    COUNT grows until vacuum.
  *
  * Per commit it samples the driver phases ([[ManifestStore.phaseHook]]:
  * publish, manifestRead) and the commit wall; at checkpoints it also
  * times listVersions and a full readTable count, and reports entry
  * count + newest-manifest bytes. Results → BASELINE.md ("Version-axis
  * rehearsal"). */
object ManifestAxisBench {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(100)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val phases = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    ManifestStore.phaseHook = (p, ns) => phases.synchronized {
      phases(p) += ns
    }
    // the loop runs 1 until commits; the final sample rides the
    // explicit i == commits - 1 clause below
    val checkpoints = Set(1, 10, 25, 50, 75)

    def batch(i: Int) = s.range(i * 100L, i * 100L + 100)
      .select(col("id").as("vec_id"),
        (col("id") % 16).cast("int").as("cell"),
        (col("id") * 2).as("payload"))

    def mfBytes(root: String): Long = {
      val dir = java.nio.file.Paths.get(root, "_manifests")
      val st = java.nio.file.Files.list(dir) // must close: holds an fd
      try st.filter(p => p.getFileName.toString.endsWith(".mf"))
        .mapToLong(p => java.nio.file.Files.size(p)).max.orElse(0L)
      finally st.close()
    }

    def scenario(name: String, maintained: Boolean,
        partitioned: Boolean, policy: Option[ManifestStore.Maintenance]
          = None, statsCols: Seq[String] = Nil): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory(s"mf-axis-$name").toString + "/store"
      if (partitioned)
        ManifestStore.create(s, root, batch(0), "cell")
      else
        ManifestStore.createTables(s, root,
          Seq((ManifestStore.TableDef("t", "", statsCols = statsCols),
            batch(0))))
      (1 until commits).foreach { i =>
        phases.synchronized(phases.clear())
        val t0 = System.nanoTime()
        if (partitioned)
          ManifestStore.upsertPartitions(s, root, batch(i), "cell")
        else
          ManifestStore.commitTables(s, root,
            policy.getOrElse(ManifestStore.Maintenance()))(
            Seq(ManifestStore.Append("t", batch(i))))
        if (maintained && i % 10 == 0) {
          ManifestStore.commitTables(s, root)(
            Seq(ManifestStore.CompactAppend("t")))
          ManifestStore.vacuum(s, root, keepLast = 5)
        }
        val wall = (System.nanoTime() - t0) / 1e9
        if (checkpoints.contains(i) || i == commits - 1) {
          val ph = phases.synchronized(phases.toMap)
          val t1 = System.nanoTime()
          val nv = ManifestStore.versions(s, root).size
          val listSec = (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          val rows = ManifestStore.readTable(s, root, "t").count()
          val readSec = (System.nanoTime() - t2) / 1e9
          val entries = ManifestStore.tableEntries(s, root, "t").size
          println(f"[axis] $name commit=$i wall=$wall%.3f " +
            f"publish=${ph("publish") / 1e9}%.3f " +
            f"manifestRead=${ph("manifestRead") / 1e9}%.3f " +
            f"versions=$nv listVersions=$listSec%.4f " +
            f"read=$readSec%.3f rows=$rows entries=$entries " +
            f"mfBytes=${mfBytes(root)}")
        }
      }
      System.gc()
    }

    scenario("append-raw", maintained = false, partitioned = false)
    scenario("append-maintained", maintained = true, partitioned = false)
    scenario("upsert-16cell", maintained = false, partitioned = true)
    // round-14 rows: the IN-STORE maintenance policy (compaction folds
    // into the same atomic commit, vacuum under the same lease — zero
    // caller-side calls) and the per-entry column-stats overhead
    scenario("append-policy", maintained = false, partitioned = false,
      policy = Some(ManifestStore.Maintenance(
        maxSegmentsPerTable = Some(10), vacuumKeepLast = Some(5))))
    scenario("append-stats", maintained = false, partitioned = false,
      statsCols = Seq("vec_id", "payload"))
    ManifestStore.phaseHook = (_, _) => ()
    s.stop()
  }
}
