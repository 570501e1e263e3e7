package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc margin check for the layout skipping gates (not part of the
  * driver contract): prints the gate relations at every bundled SF so
  * the closed-form boolean margins can be eyeballed before the gates
  * join the oracle contract. */
object LayoutScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      println(s"[layout-scratch] $sf zorder_skip_gate:")
      graft.operators.Layout.zorderSkippingGate(spark, dir).show(false)
      println(s"[layout-scratch] $sf bloom_skip_gate:")
      graft.operators.Layout.bloomSkippingGate(spark, dir).show(false)
      System.gc()
    }
    spark.stop()
  }
}
