package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc RP recall measurement (not part of the driver contract). */
object RpScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val r = graft.operators.Projection.rpRecallAtK(spark,
        s"/root/testdata/$sf", Seq(0L, 1L, 2L, 3L, 4L), k = 10, cand = 200).collect()
      println(s"$sf: " + r.map(x =>
        s"${x.getLong(0)}=${x.getDouble(1)}").mkString(" "))
    }
    spark.stop()
  }
}
