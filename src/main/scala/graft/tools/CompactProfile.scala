package graft.tools
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Dedup}
object CompactProfile {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    // replicate ivfCompactPlanted's phases
    for (rep <- 1 to 3) {
      val emb = graft.Tables.load(s, dir, "embeddings")
      val n = 5
      val isBatch = col("vec_id") % 10 === 3
      val base = emb.filter(!isBatch)
      val arriving = emb.filter(isBatch).unionByName(
        emb.filter(col("vec_id") < n)
          .withColumn("vec_id", col("vec_id") + Dedup.PlantOffset))
      val trained = t("train")(Similarity.collectCentroids(
        Similarity.kmeansIterate(s, dir, 2), "cluster"))
      val scratch = Similarity.scratchDir(s, "graft-prof-")
      val isArriving = col("vec_id") % 10 === 3 ||
        (col("vec_id") >= Dedup.PlantOffset &&
          col("vec_id") < Dedup.PlantOffset + n)
      val assignedAll = base.unionByName(arriving)
        .select(col("vec_id"), col("embedding"),
          Similarity.argmaxOver(trained).getField("cluster").as("cell"))
        .persist()
      try {
        val live = s"$scratch/live"
        t("write-base")(assignedAll.filter(!isArriving)
          .repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell")
          .option("compression", "zstd").parquet(s"$live/vectors"))
        import s.implicits._
        t("write-cents")(trained.toSeq.map { case (c, v) => (c.toLong, v.toSeq) }
          .toDF("cent_id", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(s"$live/centroids"))
        t("compact")(Similarity.ivfCompact(s, s"$live/vectors", arriving, trained))
        val queries = emb.filter(col("vec_id") < n)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
        t("probe-live")(Similarity.ivfProbeIndexedMulti(s, live, queries.toSeq, 10, 4).collect())
      } finally {
        assignedAll.unpersist()
        Similarity.deleteScratch(s, scratch)
      }
      System.gc()
    }
    s.stop()
  }
}
