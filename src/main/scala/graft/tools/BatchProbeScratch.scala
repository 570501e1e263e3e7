package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc check of the query-relation IVF batch probe (not part of the
  * driver contract): plan shape (broadcast join + dynamic partition
  * pruning) and row equality against the driver-Seq multi-probe lane. */
object BatchProbeScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val scratch = java.nio.file.Files.createTempDirectory("graft-bps-")
    try {
      graft.operators.Similarity.writeIvfIndex(spark, dir,
        scratch.toString, 16)
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val qDf = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val batch = graft.operators.Similarity.ivfProbeIndexedBatch(
        spark, scratch.toString, qDf, 10, 4)
      println("=== formatted plan ===")
      batch.explain("formatted")
      val rowsBatch = batch.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      val qSeq = emb.filter(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val rowsMulti = graft.operators.Similarity.ivfProbeIndexedMulti(
        spark, scratch.toString, qSeq.toSeq, 10, 4).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      println(s"[bps] batch=${rowsBatch.size} multi=${rowsMulti.size} " +
        s"equal=${rowsBatch == rowsMulti}")
      if (rowsBatch != rowsMulti)
        rowsBatch.zip(rowsMulti).filter { case (a, b) => a != b }
          .take(5).foreach(println)
      val plan = batch.queryExecution.executedPlan.toString
      println(s"[bps] hasBHJ=${plan.contains("BroadcastHashJoin")} " +
        s"hasDPP=${plan.contains("dynamicpruning")}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(scratch).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
