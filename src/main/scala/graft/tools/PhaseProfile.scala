package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job timeline profiler for one or more contract queries: runs each
  * query once warm then once measured, printing every Spark job's wall
  * time and call site so a lifecycle gate's seconds can be attributed to
  * its internal actions (writes, collects, commits) instead of guessed
  * at. Optimization-round tooling only — never on a query path.
  *
  * Usage: runMain graft.tools.PhaseProfile <query>[,query...] [sfDir]
  */
object PhaseProfile {

  final class JobTimeline extends SparkListener {
    case class Rec(id: Int, start: Long, var end: Long, site: String,
        desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Rec]
    var enabled = false
    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
      val site = Option(e.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      jobs.put(e.jobId, Rec(e.jobId, e.time, -1L, site, desc))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val r = jobs.get(e.jobId)
      if (r != null) r.end = e.time
    }
    def reset(): Unit = jobs.clear()
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("ann_lsh_compact"))
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tl = new JobTimeline
    spark.sparkContext.addSparkListener(tl)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm rep (codegen, scan caches) — untimed, unprofiled
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      System.gc()
      tl.reset(); tl.enabled = true
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.Bench.drainListenerBus(spark)
      tl.enabled = false
      import scala.jdk.CollectionConverters._
      val recs = tl.jobs.values.asScala.toSeq.sortBy(_.start)
      val base = recs.headOption.map(_.start).getOrElse(0L)
      println(f"\n=== $name total $sec%.3fs, ${recs.size} jobs ===")
      recs.foreach { r =>
        val dur = if (r.end < 0) -1.0 else (r.end - r.start) / 1e3
        println(f"  [job ${r.id}%3d] +${(r.start - base) / 1e3}%7.2fs " +
          f"${dur}%7.3fs  ${r.site}%-40s ${r.desc.take(60)}")
      }
      // gaps between jobs = driver-side work (planning, FS ops, commits)
      val spans = recs.filter(_.end > 0).map(r => (r.start, r.end)).sorted
      var covered = 0L; var cursor = 0L
      spans.foreach { case (s, e) =>
        val s2 = math.max(s, cursor)
        if (e > s2) { covered += e - s2; cursor = e } else cursor = math.max(cursor, e)
      }
      val jobSec = covered / 1e3
      println(f"  jobs cover $jobSec%.3fs; driver-side gap ${sec - jobSec}%.3fs")
      System.gc()
    }
    spark.stop()
  }
}
