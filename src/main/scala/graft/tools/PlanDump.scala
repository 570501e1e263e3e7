package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for the named queries to stdout-free
  * files under plans/<tag>/ — the round-15 before/after evidence
  * (ExplainDump covers the pinned headline set; this takes any query
  * whose DF can be built without executing a stream). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSeq
    val tag = if (args.length > 1) args(1) else "r15"
    val suffix = if (args.length > 2) args(2) else "before"
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
      println(s"[plandump] plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
