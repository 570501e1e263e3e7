package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Retrieval/corpus-statistics invariants that the DuckDB hash-match can't
  * express directly: BM25 ranking laws, coverage monotonicity, PMI
  * symmetry of construction, postings consistency. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bm25: scores are positive, descending, and rank-dense") {
    val rows = Retrieval.bm25Search(spark, sf).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Int]("rnk")).toSeq === (1 to 10))
    // a doc can match at most the 3 query terms
    assert(rows.forall(r => r.getAs[Long]("n_terms") >= 1 &&
      r.getAs[Long]("n_terms") <= 3))
  }

  test("bm25: term-frequency weight is increasing and saturating") {
    val k1 = 1.25; val b = 0.75
    def w(tf: Double, dl: Double, avgdl: Double) =
      tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    // one more occurrence raises the weight...
    assert(w(2, 8, 8) > w(1, 8, 8))
    // ...with shrinking marginal gain (the BM25 saturation property)
    assert(w(3, 8, 8) - w(2, 8, 8) < w(2, 8, 8) - w(1, 8, 8))
    // longer documents are penalized at equal tf
    assert(w(2, 16, 8) < w(2, 8, 8))
  }

  test("search_eval: metrics reconcile with an independent relevance " +
      "recount over the raw corpus") {
    lazy val spark2 = TestSpark.spark
    val docs = Tables.load(spark2, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSet).toMap
    val rows = Retrieval.searchEval(spark2, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    rows.zip(Retrieval.EvalQueries).foreach { case (r, terms) =>
      // n_relevant equals the brute recount of AND-relevance
      val relevant = docs.count(_._2.intersect(terms.toSet) == terms.toSet)
      assert(r.getLong(1) === relevant.toLong, terms.mkString(","))
      // rr is exactly 1/first_rank (or 0 when nothing ranked)
      val fr = r.getLong(2)
      val rr = r.getDouble(3)
      if (fr > 0) assert(rr === graft.functions.Num.t6d(1.0 / fr))
      else assert(rr === 0.0)
      // p@10 counts relevant docs among bm25's actual top 10
      val top10 = Retrieval.bm25Search(spark2, sf, terms, k = 10)
        .collect().map(_.getLong(1))
      val p10 = top10.count(id =>
        docs(id).intersect(terms.toSet) == terms.toSet) / 10.0
      assert(r.getDouble(4) === graft.functions.Num.t6d(p10),
        terms.mkString(","))
    }
    // the narrow conjunctions must actually discriminate on this corpus
    assert(rows.exists(_.getDouble(4) < 1.0),
      "at least one query's top-10 should mix in non-relevant docs")
  }

  test("vocabulary: coverage is monotone, bounded by 1, ranks dense") {
    val rows = Retrieval.vocabulary(spark, sf).collect()
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    assert(cov.forall(c => c > 0.0 && c <= 1.0))
    assert(rows.map(_.getAs[Int]("rnk")).toSeq === (1 to rows.length))
    // counts are non-increasing down the ranking
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // full vocab at this SF is small, so the last row covers everything
    assert(cov.last > 0.999999 - 1e-9)
  }

  test("pmi: supports respect the floor and pmi is finite") {
    val rows = Retrieval.pmiBigrams(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_ab") >= 5L))
    assert(rows.forall(r => !r.getAs[Double]("pmi").isNaN &&
      !r.getAs[Double]("pmi").isInfinite))
  }

  test("textrank: ranks clear the damping floor, descend, and favor " +
      "high-degree hubs") {
    val rows = Retrieval.textrankKeywords(spark, sf).collect()
    assert(rows.length === 20)
    val ranks = rows.map(_.getAs[Double]("rank"))
    // every term's rank >= the damping base (0.15 + 0.85*nonneg, t6'd)
    assert(ranks.forall(_ >= 0.15 - 1e-9))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // total rank mass is bounded by |V| · max-rank and every rank is
    // finite (the power iteration neither diverged nor NaN'd)
    assert(ranks.forall(r => !r.isNaN && !r.isInfinite && r < 100.0))
    // deterministic: an independent re-evaluation ranks identically
    // (decimal in-sums make the iteration partitioning-invariant)
    val again = Retrieval.textrankKeywords(spark, sf).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Double]("rank")))
    assert(again.toSeq ===
      rows.map(r => (r.getAs[String]("term"), r.getAs[Double]("rank"))).toSeq)
  }

  test("hybrid rrf: scores bounded by 2/61, descending, and dominated by " +
      "double-listed docs") {
    val rows = Retrieval.hybridSearch(spark, sf).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getAs[Double]("rrf_score"))
    assert(scores.forall(s => s > 0.0 && s <= 2.0 / 61.0 + 1e-9))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every fused row carries at least one source rank
    assert(rows.forall(r =>
      !r.isNullAt(r.fieldIndex("bm25_rank")) ||
      !r.isNullAt(r.fieldIndex("cos_rank"))))
    // a doc present in both lists beats a doc with one equal rank and no
    // second list (structural RRF property spot-checked on the output):
    // the top fused doc must appear in at least one list at rank <= 60
    val top = rows.head
    val bestRank = Seq(
      Option(top.getAs[Integer]("bm25_rank")).map(_.toInt),
      Option(top.getAs[Integer]("cos_rank")).map(_.toInt))
      .flatten.min
    assert(bestRank <= 60)
  }

  test("postings: df equals the recount and heads are sorted ascending") {
    val rows = Retrieval.invertedPostings(spark, sf).collect()
    assert(rows.length === 5)
    // recount df independently (distinct docs containing the term)
    val recount = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("term"))
      .filter(col("term").isin("spark", "join", "window", "hash", "scan"))
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("df") === recount(r.getAs[String]("term")))
      val head = r.getAs[String]("postings_head").split(",").map(_.toLong)
      assert(head.zip(head.tail).forall { case (a, b) => a < b })
      assert(head.head === r.getAs[Long]("first_doc"))
    }
  }

  test("zipf fit matches an independent OLS over the top-100 counts " +
      "and reports a negative power-law slope with sane r2") {
    val row = Retrieval.zipfFit(spark, sf).collect().head
    // independent reference: collect counts, rank, plain-double OLS
    val counts = Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }.take(100)
    assert(row.getLong(0) === counts.length.toLong,
      "fit must cover min(k, vocabulary size) points")
    val pts = counts.zipWithIndex.map { case ((_, n), i) =>
      (math.log((i + 1).toDouble), math.log(n.toDouble))
    }
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val icpt = (sy - slope * sx) / m
    val r2 = (m * sxy - sx * sy) * (m * sxy - sx * sy) /
      ((m * sxx - sx * sx) * (m * syy - sy * sy))
    // the operator floors per-point t6 terms; the reference uses raw
    // doubles, so agreement is to the flooring granularity, not exact
    assert(math.abs(row.getDouble(1) - slope) < 1e-3, s"slope ${row.getDouble(1)} vs $slope")
    assert(math.abs(row.getDouble(2) - icpt) < 1e-3)
    assert(math.abs(row.getDouble(3) - r2) < 1e-3)
    assert(row.getDouble(1) < -0.1 && row.getDouble(1) > -3.0)
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }
}
