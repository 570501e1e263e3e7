package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Similarity-search invariants: exact top-k, LSH bucket consistency. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("brute-force top-k: k rows, descending, cosine in [-1,1]") {
    val out = Similarity.bruteForceTopK(spark, TestSpark.sf, 0L, 10).collect()
    assert(out.length === 10)
    val sims = out.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(sims.forall(s => s >= -1.000001 && s <= 1.000001))
    assert(!out.exists(_.getLong(0) == 0L))
  }

  test("identical vectors share an LSH bucket and rank first (cos 1.0)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sim_").toString
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings")
    // plant vec 9999 = copy of vec 0
    val dup = emb.filter($"vec_id" === 0L)
      .withColumn("vec_id", org.apache.spark.sql.functions.lit(9999L))
    emb.union(dup).write.parquet(s"$dir/embeddings.parquet")
    val top = Similarity.lshTopK(spark, dir, Seq(0L), k = 5, planes = 8)
      .collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(1) === 9999L)
    // floor-truncated cosine of an identical vector: 1.0 or 0.999999
    // (self-dot/(sqrt*sqrt) can land one ulp under 1)
    assert(top.head.getDouble(2) >= 0.999999)
  }

  test("LSH top-k agrees with brute force restricted to the same bucket") {
    val lsh = Similarity.lshTopK(spark, TestSpark.sf, Seq(0L), k = 5, planes = 4)
      .collect()
    assert(lsh.nonEmpty)
    val brute = Similarity.bruteForceTopK(spark, TestSpark.sf, 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every LSH score must equal the exact score for that vector
    lsh.foreach { r =>
      assert(math.abs(brute(r.getLong(1)) - r.getDouble(2)) < 1e-9)
    }
  }

  test("near-dup pairs: planted duplicate detected at cos >= 0.9") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sim_").toString
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings")
    val dup = emb.filter($"vec_id" === 7L)
      .withColumn("vec_id", org.apache.spark.sql.functions.lit(8888L))
    emb.union(dup).write.parquet(s"$dir/embeddings.parquet")
    val pairs = Similarity.embeddingNearDupPairs(spark, dir, 0.9).collect()
    assert(pairs.exists(r => r.getLong(0) == 7L && r.getLong(1) == 8888L))
  }

  test("IVF: planted duplicate shares the query's cell and ranks first") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    val emb = graft.Tables.load(spark, TestSpark.sf, "embeddings")
    // an identical vector gets identical centroid similarities -> same cell
    val dup = emb.filter($"vec_id" === 3L)
      .withColumn("vec_id", org.apache.spark.sql.functions.lit(7777L))
    emb.union(dup).write.parquet(s"$dir/embeddings.parquet")
    val top = Similarity.ivfTopK(spark, dir, Seq(3L), k = 5).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(1) === 7777L)
    assert(top.head.getDouble(2) >= 0.999999)
  }

  test("IVF scores are exact within the probed cells") {
    val ivf = Similarity.ivfTopK(spark, TestSpark.sf, Seq(0L, 1L), k = 5)
      .collect()
    assert(ivf.nonEmpty)
    assert(ivf.count(_.getLong(0) == 0L) <= 5)
    val brute = Similarity.bruteForceTopK(spark, TestSpark.sf, 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.filter(_.getLong(0) == 0L).foreach { r =>
      assert(math.abs(brute(r.getLong(1)) - r.getDouble(2)) < 1e-9)
    }
  }

  test("norms: positive, oracle-rounded") {
    val out = Similarity.norms(spark, TestSpark.sf).collect()
    assert(out.length === 500)
    assert(out.forall(_.getDouble(1) > 0))
  }
}
