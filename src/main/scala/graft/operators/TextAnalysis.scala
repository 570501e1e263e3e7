package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num
import graft.functions.TextFunctions._

/** Text-analysis queries over the `documents` table (extension surface:
  * language-ID, quality scoring, token counting, fingerprinting). All are
  * single-pass narrow scans — no shuffle except the final presentation
  * sort and the token-histogram group-by. */
object TextAnalysis {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-document token/character statistics (oracle-checked). */
  def textStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        punctCount(col("text")).as("n_punct"),
        Num.t6(avgTokenLen(col("text"))).as("avg_token_len"))
      .orderBy("doc_id")

  /** Composite quality score per document (oracle-checked: deterministic
    * arithmetic over counts). */
  def qualityScores(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        Num.t6(stopwordRatio(col("text"))).as("stopword_ratio"),
        Num.t6(punctRatio(col("text"))).as("punct_ratio"),
        qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Intra-document repetition signals (the Gopher/C4 family of quality
    * filters): repeated word-bigram/trigram fraction and most-frequent-
    * word mass (duplicate-WORD fraction already ships as
    * `boilerplate_scores.repeat_ratio`). High values flag boilerplate
    * and degenerate generations; at 100 TB this is a pure narrow scan —
    * every signal is computed per row from one materialized token array,
    * no shuffle before the presentation sort.
    *
    * HOF contract (see [[graft.functions.TextFunctions.shingles]]): the
    * token array is materialized as an attribute first, so lambdas
    * reference an attribute and nothing re-tokenizes per element. */
  def repetitionScores(s: SparkSession, dir: String): DataFrame = {
    def ngramRepeatFrac(w: Column, n: Int): Column = {
      val grams = transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*))
      // gram count is just arithmetic on the token count — building the
      // gram array a second time only to size() it doubled the row work
      when(size(w) <= n, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(grams)).cast("double")
          / (size(w) - (n - 1)).cast("double"))
    }
    // most-frequent-word mass: distinct vocab is small per doc, so the
    // O(|vocab| * n) nested HOF stays cheap and codegen'd
    def topWordFrac(w: Column): Column =
      array_max(transform(array_distinct(w),
        x => size(filter(w, y => y === x)))).cast("double") / size(w)
    t(s, dir, "documents")
      .withColumn("w", tokens(col("text")))
      .filter(size(col("w")) > 0)
      .select(
        col("doc_id"),
        Num.t6(ngramRepeatFrac(col("w"), 2)).as("bigram_repeat_frac"),
        Num.t6(ngramRepeatFrac(col("w"), 3)).as("trigram_repeat_frac"),
        Num.t6(topWordFrac(col("w"))).as("top_word_frac"))
      .orderBy("doc_id")
  }

  /** Shannon entropy of the token distribution per document, in bits.
    * Low entropy = degenerate/repetitive text (the information-theoretic
    * cousin of [[repetitionScores]]). Same narrow-scan shape; log2 is
    * floor-truncated to 6 decimals so libm-vs-JVM last-ulp differences
    * cannot surface in the gate. */
  def entropyScores(s: SparkSession, dir: String): DataFrame = {
    val w = col("w")
    val n = size(w).cast("double")
    // per-POSITION contribution log2(c_x/n)/n summed in document order: a
    // left fold over the token array itself, not over array_distinct —
    // distinct-ordering is engine-specific and FP addition is order-
    // sensitive, so folding in a canonical order is what keeps the oracle
    // bit-identical. O(n^2) token equality per row; n ~ 50 here.
    val entropy = - aggregate(w, lit(0.0d),
      (acc, x) => acc +
        log2(size(filter(w, y => y === x)).cast("double") / n) / n)
    t(s, dir, "documents")
      .withColumn("w", tokens(col("text")))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_vocab"),
        Num.t6(entropy).as("token_entropy"))
      .orderBy("doc_id")
  }

  /** Per-source length quantiles (exact linear-interpolation percentile —
    * the corpus-shape dashboard a curation run reads before choosing mix
    * weights). One shuffle on the handful of source keys. */
  def sourceLengthQuantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        Num.t6(percentile(col("n_chars"), lit(0.25))).as("q25"),
        Num.t6(percentile(col("n_chars"), lit(0.5))).as("q50"),
        Num.t6(percentile(col("n_chars"), lit(0.75))).as("q75"))
      .orderBy("source")

  /** Language-ID heuristic per document, with the table's labeled `lang`
    * for side-by-side comparison (rows-only check: marker-set heuristic is
    * not ANSI-SQL-expressible). */
  def langIdPredictions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("lang_labeled"),
        langId(col("text")).as("pred"))
      .select(col("doc_id"), col("lang_labeled"),
        col("pred.lang").as("lang_pred"), col("pred.score").as("score"))
      .orderBy("doc_id")

  /** Order-sensitive document fingerprint: md5 of the whitespace-
    * normalized token sequence. Equal fingerprint = duplicate candidate
    * (same tokens, same order, ignoring whitespace variation). md5 rather
    * than the rolling-hash [[graft.functions.TextFunctions.fingerprint]]
    * expression so the digest is oracle-reproducible; the rolling-hash
    * variant remains the cheaper library API (one pass, no digest alloc)
    * and is pinned by `SketchSpec`. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        md5(concat_ws(" ", tokens(col("text")))).as("fp"))
      .orderBy("doc_id")

  /** Corpus-level token frequency top-20 (explode -> hash aggregate ->
    * top-k; the shuffle carries (token, partial count) pairs only). */
  def tokenHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
}
