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
    val dir = "/root/testdata/sf0.01"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val pairs = time("minhashPairs count") {
      val p = graft.operators.Dedup.minhashPairs(spark, dir).cache()
      p.count()
      p
    }
    val edges = time("edges") {
      val e = pairs
        .select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct().cache()
      e.count()
      e
    }
    var labels = time("init labels") {
      val l = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id")).cache()
      l.count()
      l
    }
    var changed = 1L
    var i = 0
    while (changed > 0 && i < 20) {
      changed = time(s"round $i") {
        val nbr = edges
          .join(labels.withColumnRenamed("doc_id", "dst")
            .withColumnRenamed("cluster_id", "lbl"), Seq("dst"))
          .select(col("src").as("doc_id"), col("lbl"),
            lit(null).cast("long").as("prev"))
        val self = labels.select(col("doc_id"), col("cluster_id").as("lbl"),
          col("cluster_id").as("prev"))
        val stepped = nbr.unionByName(self)
          .groupBy(col("doc_id"))
          .agg(min(col("lbl")).as("cluster_id"), max(col("prev")).as("prev"))
          .cache()
        val c = stepped.filter(col("cluster_id") =!= col("prev")).count()
        labels = stepped.select("doc_id", "cluster_id")
        c
      }
      i += 1
    }
    println(s"[scratch] rounds: $i")
    spark.stop()
  }
}
