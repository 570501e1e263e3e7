package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: scan-split parallelism vs openCostInBytes on the
  * single-file contract tables (q1 shape). Not on any query path. */
object SplitExp {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // per-stage task counts + cumulative task time
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, String)]
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        stages.merge(e.stageId, (1, if (m == null) 0L else m.executorRunTime, ""),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3))
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.merge(si.stageId, (0, 0L, si.name.take(60)),
          (a, b) => (a._1, a._2, b._3))
      }
    })
    // phase split: DF build / plan / first-byte
    Seq("q1_pricing", "q3_shipping").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(s, dir).write.format("noop").mode("overwrite").save() // warm
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        val df = fn(s, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis+optimize+physical
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[splitexp] phases $q build=${(t1-t0)/1e9}%.3f " +
          f"plan=${(t2-t1)/1e9}%.3f exec=${(t3-t2)/1e9}%.3f")
        System.gc()
      }
    }
    val qs = Seq("q1_pricing", "q3_shipping", "profile_lineitem")
    for (oc <- Seq("4194304")) {
      s.conf.set("spark.sql.files.openCostInBytes", oc)
      qs.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        fn(s, dir).write.format("noop").mode("overwrite").save() // warm
        System.gc()
        stages.clear()
        val reps = (1 to 1).map { _ =>
          val t0 = System.nanoTime()
          fn(s, dir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          System.gc(); sec
        }.sorted
        graft.Bench.drainListenerBus(s)
        println(f"[splitexp] oc=$oc $q wall=${reps(0)}%.3f")
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (n, ms, nm)) =>
          println(f"[splitexp]   stage $id%4d tasks=$n%3d taskTime=${ms / 1e3}%.2fs $nm")
        }
      }
    }
    s.stop()
  }
}
