package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants. */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001 (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("oracle SQL aliases match the Spark result columns (hash contract)") {
    // The driver sorts columns by name before hashing, so names must align.
    // Verified end-to-end by tools/verify_local.py; here we just pin that
    // every query runs and yields a schema on the smallest SF.
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("queries are deterministic: two runs, identical results (sample)") {
    for (name <- Seq("q1_pricing", "minhash_pairs", "top10_per_day",
        "ann_brute_topk", "fingerprints", "ann_ivf_topk", "asof_join",
        "embed_neardup_pairs", "mm_resize",
        "decontaminate", "pack_sequences", "repetition_scores",
        "entropy_scores", "dedup_clusters_planted")) {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, TestSpark.sf).collect()
      val b = fn(spark, TestSpark.sf).collect()
      assert(a.toSeq === b.toSeq, name)
    }
  }
}
