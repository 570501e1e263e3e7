package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val lsh = graft.operators.Similarity.lshRecallAtK(spark, dir, qids)
        .collect().map(r => r.getLong(0) -> r.getDouble(1))
      println(s"[scratch] $dir lsh recall@10: ${lsh.mkString(", ")}")
      val ivf = graft.operators.Similarity.ivfRecallAtK(spark, dir, qids)
        .collect().map(r => r.getLong(0) -> r.getDouble(1))
      println(s"[scratch] $dir ivf recall@10: ${ivf.mkString(", ")}")
      val vol = graft.operators.Dedup.minhashCandidateVolume(spark, dir)
        .collect()
      println(s"[scratch] $dir candidate volume: ${vol.mkString(";")}")
      System.gc()
    }
    spark.stop()
  }
}
