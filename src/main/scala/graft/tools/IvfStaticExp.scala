package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session timing of the streamed-IVF static side's components
  * (train / base write / drop write) — round-16 attribution of the
  * ~1.6 s job PhaseProfile saw in stream_ivf_compact's setup. Not on
  * any query path. */
object IvfStaticExp {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.operators.Similarity
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val isBatch = col("vec_id") % 10 === 3
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfexp] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    for (rep <- 1 to 3) {
      println(s"[ivfexp] -- rep $rep --")
      val trained = t("train (kmeansIterate 2 + collect)") {
        Similarity.collectCentroids(Similarity.kmeansIterate(spark, dir, 2),
          "cluster")
      }
      t("train with wholeStage codegen OFF (diagnostic)") {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        try Similarity.collectCentroids(
          Similarity.kmeansIterate(spark, dir, 2), "cluster")
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }
      val scratch = Similarity.scratchDir(spark, "graft-ivfexp-")
      try {
        t("base index write (argmax + byKeysN + zstd)") {
          emb.filter(!isBatch)
            .select(col("vec_id"), col("embedding"),
              Similarity.argmaxOver(trained).getField("cluster").as("cell"))
            .transform(graft.plans.Writers.byKeysN(_, trained.length,
              col("cell")))
            .write.mode("overwrite").partitionBy("cell")
            .option("compression", "zstd").parquet(s"$scratch/vectors")
        }
        t("drop write (coalesce 2)") {
          emb.filter(isBatch)
            .coalesce(2).write.mode("overwrite")
            .parquet(s"$scratch/drop")
        }
      } finally Similarity.deleteScratch(spark, scratch)
      System.gc()
    }
    spark.stop()
  }
}
