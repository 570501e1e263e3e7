package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num
import graft.functions.TextFunctions._

/** Keyword-retrieval and corpus-statistics operators over `documents`:
  * BM25 ranking, vocabulary construction, PMI collocations, and inverted
  * postings. The reference has no text surface (SURVEY.md §2.7); these are
  * extension operators a training-data pipeline uses for corpus QA and
  * lexical retrieval (the non-embedding half of `Similarity.searchDocs`).
  *
  * Scale shape shared by everything here: one narrow tokenize scan, one
  * hash aggregate keyed on (doc, term) or (term) — the shuffle carries
  * (key, partial count) pairs, never text — and |vocab|-sized side tables
  * broadcast back. Natural-language vocabularies are ~1e6 terms at any
  * corpus size, so the broadcast side stays small even at 100 TB.
  */
object Retrieval {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Default query for the BM25 / postings demos (terms present at every
    * bundled SF). */
  val DefaultQuery: Seq[String] = Seq("spark", "join", "window")

  /** Okapi BM25 top-k for a fixed bag-of-words query.
    *
    * Classic formulation (Robertson/Spärck Jones):
    * score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))
    * with the non-negative idf = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Plan: tokenize once; per-(doc, query-term) tf with the doc length
    * carried through the aggregate; df/N/avgdl as tiny broadcast
    * aggregates; one final shuffle on doc_id. Per-term contributions are
    * floor-truncated then decimal-summed so the per-doc score (and hence
    * the ranking) is bit-identical across engines and partitionings. */
  /* k1/b defaults are the textbook 1.2/0.75 rounded to exactly-
   * representable doubles (1.25/0.75) so every literal is bit-identical
   * in any engine's decimal->double conversion. */
  /** The per-document score table behind [[bm25Search]]:
    * (doc_id, score, n_terms) for every document matching at least one
    * query term. Shared by the top-k search and [[searchEval]]. */
  private def bm25Scores(s: SparkSession, dir: String, query: Seq[String],
      k1: Double, b: Double): DataFrame =
    bm25ScoresOn(tokenizedDocs(s, dir), query, k1, b)

  /** The tokenized corpus both bm25 branches read: (doc_id, w, dl). */
  private def tokenizedDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("dl"))

  private def bm25ScoresOn(docs: DataFrame, query: Seq[String],
      k1: Double, b: Double): DataFrame = {
    val qArr = array(query.map(lit): _*)
    val hits = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .filter(array_contains(qArr, col("term")))
    val tf = hits.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val contrib = Num.t6(
      log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
        / (col("df") + lit(0.5))) *
      (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(Relational.dsum(contrib).as("score"),
        count(lit(1)).as("n_terms"))
  }

  def bm25Search(s: SparkSession, dir: String,
      query: Seq[String] = DefaultQuery, k: Int = 10,
      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    bm25Scores(s, dir, query, k1, b)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("rnk").cast("int").as("rnk"), col("doc_id"),
        col("score"), col("n_terms"))
      .orderBy("rnk")
  }

  /** The fixed evaluation query set for [[searchEval]] (terms present at
    * every bundled SF — the postings/bm25 vocabulary). */
  val EvalQueries: Seq[Seq[String]] = Seq(
    Seq("spark", "join", "window"),
    Seq("dup", "hash", "scan"),
    Seq("dup", "spark", "join", "window", "scan"))

  /** Retrieval-quality evaluation of the BM25 ranker — the search-QA
    * report a corpus pipeline runs after every index rebuild: per eval
    * query, with relevance defined as "document contains EVERY query
    * term" (boolean-AND judgments, fully oracle-expressible), the
    * relevant-set size, the rank of the first relevant document in BM25
    * order, its reciprocal rank (the per-query MRR contribution), and
    * precision@10.
    *
    * Scale shape: each query reuses [[bm25Scores]]' one-scan aggregate;
    * ranking is capped at `cap` (WindowGroupLimit-prunable — the
    * hybrid_search bound discipline: a first-relevant beyond rank 1000
    * scores 0, which is what MRR@1000 means). The eval set is
    * queries-sized metadata; all per-query frames union into one
    * q-row relation. */
  def searchEval(s: SparkSession, dir: String,
      queries: Seq[Seq[String]] = EvalQueries, cap: Int = 1000,
      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    // Tokenize ONCE for the whole eval set, and materialize each
    // query's per-doc score table ONCE for its two consumers (the
    // ranked window and the relevant-set count). Without this, every
    // reference re-derives the tokenize+explode subtree — the unioned
    // plan scanned `documents` 36 times (3 queries × 2 consumers × 3
    // scans inside bm25Scores, 90 Exchanges). Values are unchanged
    // (localCheckpoint only cuts lineage); at index scale an eval
    // suite reads the materialized postings the index build already
    // wrote, which is exactly this shape.
    val docs = tokenizedDocs(s, dir).localCheckpoint(true)
    val perQuery = queries.zipWithIndex.map { case (terms, i) =>
      val scores = bm25ScoresOn(docs, terms, k1, b).localCheckpoint(true)
      val rel = col("n_terms") === terms.length
      val w = Window.orderBy(col("score").desc, col("doc_id"))
      val ranked = scores.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= cap)
      val mRanked = ranked.agg(
        min(when(rel, col("rnk"))).as("fr"),
        sum(when(rel && col("rnk") <= 10, 1L).otherwise(0L)).as("rel10"))
      val nRel = scores.filter(rel).agg(count(lit(1)).as("n_relevant"))
      nRel.crossJoin(mRanked).select(
        lit(i).as("q_id"), col("n_relevant"),
        coalesce(col("fr"), lit(0)).cast("long").as("first_rank"),
        Num.t6(coalesce(lit(1.0) / col("fr"), lit(0.0))).as("rr"),
        Num.t6(col("rel10").cast("double") / lit(10.0)).as("p_at_10"))
    }
    perQuery.reduce(_.unionByName(_)).orderBy("q_id")
  }

  /** Frequency-ranked vocabulary with cumulative corpus coverage — the
    * tokenizer-training prerequisite (what fraction of all token
    * occurrences the top-r terms explain). Rank ties break by term;
    * the cumulative sum is over exact longs, so coverage is
    * engine-deterministic. One explode + one |vocab| aggregate; the
    * rank/cumsum window runs on the |vocab|-sized result, not the corpus. */
  def vocabulary(s: SparkSession, dir: String, k: Int = 200): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("n_total"))
    val ord = Window.orderBy(col("n").desc, col("term"))
    counts.crossJoin(broadcast(tot))
      .withColumn("rnk", row_number().over(ord))
      .withColumn("cum_n", sum(col("n")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rnk") <= k)
      .select(col("rnk").cast("int").as("rnk"), col("term"), col("n"),
        Num.t6(col("cum_n").cast("double") / col("n_total"))
          .as("coverage"))
      .orderBy("rnk")
  }

  /** Zipf-law fit over the head of the token-frequency distribution —
    * the corpus-statistics QA a dataset card reports (natural language
    * sits near slope −1; template-heavy or machine-generated corpora
    * bend the curve, so the fitted slope and r² are cheap generation
    * detectors): closed-form OLS of ln(count) on ln(rank) over the top
    * `k` terms. Head-only is standard practice (the long tail departs
    * from the power law and drowns the fit) and the scale reason too:
    * the rank filter prunes to k rows map-side (WindowGroupLimit), so
    * no full-vocabulary ordering is ever materialized and the fit input
    * is k points of metadata.
    *
    * Exactness: x = t6(ln rank), y = t6(ln count) are identical doubles
    * on both engines (the tfidf log precedent); each per-point product
    * is t6-floored then decimal-summed, and slope / intercept / r² are
    * scalar arithmetic over those exact aggregates, parenthesized
    * identically in the oracle. */
  def zipfFit(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val counts = t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val ord = Window.orderBy(col("n").desc, col("term"))
    val pts = counts.withColumn("rnk", row_number().over(ord))
      .filter(col("rnk") <= k)
      .select(Num.t6(log(col("rnk").cast("double"))).as("x"),
        Num.t6(log(col("n").cast("double"))).as("y"))
    val agg = pts.agg(
      count(lit(1)).cast("double").as("m"),
      Relational.dsum(col("x")).as("sx"),
      Relational.dsum(col("y")).as("sy"),
      Relational.dsum(Num.t6(col("x") * col("y"))).as("sxy"),
      Relational.dsum(Num.t6(col("x") * col("x"))).as("sxx"),
      Relational.dsum(Num.t6(col("y") * col("y"))).as("syy"))
    val sl = (col("m") * col("sxy") - col("sx") * col("sy")) /
      (col("m") * col("sxx") - col("sx") * col("sx"))
    val r2n = (col("m") * col("sxy") - col("sx") * col("sy")) *
      (col("m") * col("sxy") - col("sx") * col("sy"))
    val r2d = (col("m") * col("sxx") - col("sx") * col("sx")) *
      (col("m") * col("syy") - col("sy") * col("sy"))
    agg.select(col("m").cast("long").as("n_terms"),
      Num.t6(sl).as("slope"),
      Num.t6((col("sy") - sl * col("sx")) / col("m")).as("intercept"),
      Num.t6(r2n / r2d).as("r2"))
  }

  /** Pointwise mutual information over adjacent word pairs — collocation
    * mining (PMI = ln(p(ab) / (p(a)·p(b))) with p from corpus counts).
    * Bigram and unigram tables are each one explode + one aggregate; the
    * two unigram joins are broadcasts of the |vocab|-sized count table.
    * Ranking runs on the floor-truncated score so a sub-1e-6 ulp
    * difference can never flip an order. `minCount` floors the bigram
    * support (PMI is noise on rare pairs). */
  def pmiBigrams(s: SparkSession, dir: String,
      minCount: Int = 5, k: Int = 50): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("w"))
    val big = toks.filter(size(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => struct(element_at(col("w"), i).as("a"),
          element_at(col("w"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    val uni = toks
      .select(explode(col("w")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val totals = big.agg(sum(col("n_ab")).as("t_big"))
      .crossJoin(uni.agg(sum(col("n")).as("t_uni")))
    val ranked = Window.orderBy(col("pmi").desc, col("a"), col("b"))
    big.filter(col("n_ab") >= minCount)
      .join(broadcast(uni.withColumnRenamed("term", "a")
        .withColumnRenamed("n", "n_a")), Seq("a"))
      .join(broadcast(uni.withColumnRenamed("term", "b")
        .withColumnRenamed("n", "n_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_ab"),
        Num.t6(log((col("n_ab").cast("double") / col("t_big"))
          / ((col("n_a").cast("double") / col("t_uni"))
            * (col("n_b").cast("double") / col("t_uni"))))).as("pmi"))
      .withColumn("rnk", row_number().over(ranked))
      .filter(col("rnk") <= k)
      .select(col("rnk").cast("int").as("rnk"), col("a"), col("b"),
        col("n_ab"), col("pmi"))
      .orderBy("rnk")
  }

  /** TextRank keyword extraction: weighted PageRank over the word
    * adjacency graph (nodes = vocabulary, edge a→b weighted by adjacent-
    * pair count), fixed `iters` power iterations with damping 0.85 —
    * Mihalcea & Tarau '04, the classic graph-based keyword ranker.
    *
    * Determinism discipline: every per-edge contribution
    * w(u,v)/W(u)·r(u) is floor-truncated, the incoming sum is exact
    * decimal (order-independent on any partitioning), and each
    * iteration's rank is re-truncated — so all `iters` rounds are
    * bit-identical across engines and the oracle replays them as chained
    * CTEs. Terms with no incoming edges keep the damping base via the
    * left join from the vocabulary.
    *
    * Scale shape: the graph is |vocab|²-bounded but natural-language
    * sparse; each iteration is one join of the edge list with the
    * |vocab|-sized rank table (broadcast) and one aggregate keyed on the
    * destination term — the connectedComponents loop's shape with ranks
    * instead of labels. Iteration count is FIXED (power iteration), so
    * the plan is a static 4-deep chain, no driver-side convergence
    * actions at all. */
  def textrankKeywords(s: SparkSession, dir: String,
      iters: Int = 4, k: Int = 20): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("w"))
    val edges = toks.filter(size(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => struct(element_at(col("w"), i).as("u"),
          element_at(col("w"), i + 1).as("v")))).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("wgt"))
    val outW = edges.groupBy(col("u")).agg(sum(col("wgt")).as("wout"))
    // the edge graph and the vocabulary are STATIC across iterations but
    // referenced by every round — without materialization each of the
    // `iters` contrib joins (and the final rank) re-derives the whole
    // tokenize + explode + aggregate subtree (26 corpus scans /
    // 66 exchanges in the 4-iteration plan). Both tables are the
    // vocab-bounded model state the scaladoc describes (the same size
    // class as the per-iteration broadcast), so one materialization is
    // the searchEval/pplBuckets discipline, not a corpus cache.
    val norm = edges.join(broadcast(outW), Seq("u")).localCheckpoint(true)
    val vocabTerms = toks.select(explode(col("w")).as("term")).distinct()
      .localCheckpoint(true)
    val init = vocabTerms.withColumn("rank", lit(1.0))
    val ranks = (1 to iters).foldLeft(init) { (r, _) =>
      val contrib = norm
        .join(broadcast(r.withColumnRenamed("term", "u")), Seq("u"))
        .select(col("v").as("term"),
          Num.t6(col("wgt").cast("double") / col("wout") * col("rank"))
            .as("c"))
        .groupBy(col("term"))
        .agg(Relational.dsum(col("c")).as("in_sum"))
      vocabTerms.join(contrib, Seq("term"), "left")
        .select(col("term"),
          Num.t6(lit(0.15) + lit(0.85)
            * coalesce(col("in_sum"), lit(0.0))).as("rank"))
    }
    ranks
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rank").desc, col("term"))))
      .filter(col("rnk") <= k)
      .select(col("rnk").cast("int").as("rnk"), col("term"), col("rank"))
      .orderBy("rnk")
  }

  /** Hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et al.
    * '09 — the standard lexical+semantic fusion): bounded top-`n` BM25
    * and top-`n` cosine candidate lists against the same query (query
    * text = the fixed term set; query vector = the stored embedding of
    * `queryId`, with vec_id aligned to doc_id in this corpus), fused as
    * Σ 1/(60 + rank). Documents missing from a candidate list (no BM25
    * hit, or beyond rank `n`) contribute nothing for that side — the
    * standard bounded-RRF treatment: a rank past `n` = 1000 would add at
    * most 1/1060 ≈ 9.4e-4 and cannot displace a true top-k fusion hit in
    * practice, which is why production fusers (Elasticsearch, Vespa)
    * fuse candidate windows, never full rankings. The bound is also the
    * scale contract: every `row_number` window here has k ≤ `n`, so
    * Spark's WindowGroupLimit prunes each partition to `n` rows before
    * the single-partition rank — without it the whole corpus funnels
    * through one task. Both rankings and the fusion rank on
    * floor-truncated scores, ties by id, so the full chain is
    * engine-deterministic and the oracle replays the same bound. Scale
    * shape: two bounded ranked lists (each the already-scale-shaped
    * bm25/cosine plan), one join on ≤ 2n rows, one top-k window. */
  def hybridSearch(s: SparkSession, dir: String,
      query: Seq[String] = DefaultQuery, queryId: Long = 0L,
      k: Int = 10, n: Int = 1000): DataFrame = {
    // bounded BM25 candidates: top-n (WindowGroupLimit prunes per
    // partition because the rank filter is a finite k)
    val bm25 = bm25Search(s, dir, query, k = n)
      .select(col("doc_id"), col("rnk").as("bm25_rank"))
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val cosRanked = emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        Num.t6(graft.operators.Similarity.cosine(
          col("embedding"), col("q_emb"))).as("cos_sim"))
      .withColumn("cos_rank", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("doc_id"))))
      .filter(col("cos_rank") <= n)
      .select(col("doc_id"), col("cos_rank"))
    val rrf = Num.t6(
      coalesce(lit(1.0) / (lit(60.0) + col("bm25_rank")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60.0) + col("cos_rank")), lit(0.0)))
    bm25.join(cosRanked, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"),
        rrf.as("rrf_score"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("rnk").cast("int").as("rnk"), col("doc_id"),
        col("bm25_rank"), col("cos_rank"), col("rrf_score"))
      .orderBy("rnk")
  }

  /** Inverted-index postings for a fixed term set: document frequency plus
    * a bounded posting-list head (first `headLen` doc_ids, ascending,
    * comma-joined so the value is renderer-independent).
    *
    * The head bound is the scale contract: a full posting list for a
    * common term is corpus-sized and must live as a partitioned/bucketed
    * TABLE (one row per (term, doc_id), keyed on term — exactly the `tf`
    * aggregate this derives from), never as one array row. So the head is
    * bounded BEFORE any collect: a per-term rank window (rnk <= headLen,
    * which Spark 4's WindowGroupLimit prunes to headLen rows per
    * partition) feeds a collect_list that can never hold more than
    * `headLen` ids, while df/min/max aggregate the unbounded stream
    * without materializing it — a common term costs O(headLen) executor
    * memory, not O(df). */
  def invertedPostings(s: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "join", "window", "hash", "scan"),
      headLen: Int = 100): DataFrame = {
    val qArr = array(terms.map(lit): _*)
    val hits = t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(array_contains(qArr, col("term")))
      .select(col("term"), col("doc_id"))
      .distinct()
    val stats = hits.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
    val head = hits
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("doc_id"))))
      .filter(col("rnk") <= headLen)
      .groupBy(col("term"))
      .agg(concat_ws(",", array_sort(collect_list(col("doc_id"))))
        .as("postings_head"))
    stats.join(head, Seq("term"))
      .select(col("term"), col("df"), col("first_doc"), col("last_doc"),
        col("postings_head"))
      .orderBy("term")
  }
}
