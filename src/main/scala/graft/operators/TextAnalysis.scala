package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
