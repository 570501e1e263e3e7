package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Scoped k-sweep of the adaptive-k SemDeDup lane — the round-12
  * verdict's "measure the recall-vs-wall trade, don't assert it" item:
  * at k = 16 (the flat-k floor), k = √N̂ (what [[Similarity.semDedupAdaptiveK]]
  * picks), and k = 4·√N̂, measure
  *
  *  - the k-means|| seeding wall (the cost adaptive k ADDS),
  *  - the full pipeline wall (assign + within-cluster verify),
  *  - the k-means objective Σ(1 − max-cos) (cluster tightness — the
  *    "recall" proxy: tighter clusters keep near-dup pairs together),
  *  - the within-cluster candidate-pair volume Σ n·(n−1)/2 (the
  *    verify join size — the N^1.5 term the sweep trades against).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.SemDedupSweep [reps]"
  * Results → BASELINE.md ("SemDeDup k-sweep"). */
object SemDedupSweep {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.Tables.load(s, dir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("label"))
    val kHat = Similarity.semDedupAdaptiveK(emb)
    println(s"[sweep] adaptive k-hat = $kHat")
    Seq(("k16", 16), ("sqrtN", kHat), ("4sqrtN", 4 * kHat)).foreach {
      case (tag, k) =>
        (1 to reps).foreach { rep =>
          val t0 = System.nanoTime()
          val cents = Similarity.kmeansParCentroids(emb, k)
          val seedSec = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val survivors = Similarity
            .semDedupOnCentroidRelation(emb, cents, 0.99).count()
          val pipeSec = (System.nanoTime() - t1) / 1e9
          val (obj, pairs) = Similarity.semDedupClusterStats(emb, cents)
          println(f"[sweep] $tag k=$k rep$rep seed=$seedSec%.2fs " +
            f"pipeline=$pipeSec%.2fs total=${seedSec + pipeSec}%.2fs " +
            f"objective=$obj%.2f pairs=${pairs.toLong} " +
            f"survivors=$survivors")
          System.gc()
        }
    }
    s.stop()
  }
}
