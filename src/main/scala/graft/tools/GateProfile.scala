package graft.tools
import org.apache.spark.sql.SparkSession
object GateProfile {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    for (rep <- 1 to 4) {
      val t0 = System.nanoTime()
      graft.operators.Similarity.ivfCompactPlanted(s, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] gate ${(System.nanoTime()-t0)/1e9}%.2fs")
      System.gc()
    }
    s.stop()
  }
}
