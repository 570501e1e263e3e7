package graft.tools

import org.apache.spark.sql.SparkSession

/** Loop one contract query for thread-dump profiling. Not on any
  * query path. Usage: runMain graft.tools.LoopRun <query> [reps] */
object LoopRun {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing")
    val reps = if (args.length > 1) args(1).toInt else 60
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      fn(s, "/root/testdata/sf0.1").write.format("noop")
        .mode("overwrite").save()
      println(f"[loop] ${(System.nanoTime() - t0) / 1e9}%.3f")
      System.gc()
    }
    s.stop()
  }
}
