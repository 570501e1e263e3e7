package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharNgramSet, CosineSim, HyperplaneBands, MinHashBandBuckets, MinHashSignature, RepetitionStats, SimHash64, TokenEntropy, TokenFingerprint, WordGramMd5s, WordShingles}

/** SQL surface for the custom sketch expressions: registered in the
  * function registry, so `spark.sql("SELECT minhash_signature(...)")`
  * plans the same single-pass Catalyst expressions the DataFrame API
  * uses (SketchExpressions). Two registration paths:
  *
  * - `GraftExtensions` for session construction
  *   (`SparkSession.builder().withExtensions(new GraftExtensions)` or
  *   `spark.sql.extensions=graft.plans.GraftExtensions`) — the standard
  *   deployment hook;
  * - `register(spark)` for an already-running session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // flag-gated approximate mode (no-op unless the session opts in)
    e.injectOptimizerRule(_ => ApproxRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  /** (name, info, builder) for every sketch function. Arity checked by
    * the builders; k/bands/n parameters are literal-int arguments. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("word_shingles",
      info("word_shingles", "word_shingles(tokens[, n]) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => WordShingles(t, 3)
        case Seq(t, n) => WordShingles(t, intArg(n, "word_shingles"))
        case _ => throw new IllegalArgumentException("word_shingles(tokens[, n])")
      }),
    ("word_gram_md5s",
      info("word_gram_md5s", "word_gram_md5s(tokens, n) - md5 of every positioned word n-gram"),
      (args: Seq[Expression]) => args match {
        case Seq(t, n) => WordGramMd5s(t, intArg(n, "word_gram_md5s"))
        case _ => throw new IllegalArgumentException("word_gram_md5s(tokens, n)")
      }),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(shingles[, k]) - k-wide MinHash signature"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => MinHashSignature(s, 64)
        case Seq(s, k) => MinHashSignature(s, intArg(k, "minhash_signature"))
        case _ => throw new IllegalArgumentException("minhash_signature(shingles[, k])")
      }),
    ("minhash_band_buckets",
      info("minhash_band_buckets", "minhash_band_buckets(shingles[, k, bands]) - LSH band bucket keys"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => MinHashBandBuckets(s, 64, 16)
        case Seq(s, k, b) =>
          MinHashBandBuckets(s, intArg(k, "minhash_band_buckets"),
            intArg(b, "minhash_band_buckets"))
        case _ => throw new IllegalArgumentException(
          "minhash_band_buckets(shingles[, k, bands])")
      }),
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHash64(t)
        case _ => throw new IllegalArgumentException("simhash64(tokens)")
      }),
    ("char_ngram_set",
      info("char_ngram_set", "char_ngram_set(text[, n]) - distinct char n-grams"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => CharNgramSet(t, 5)
        case Seq(t, n) => CharNgramSet(t, intArg(n, "char_ngram_set"))
        case _ => throw new IllegalArgumentException("char_ngram_set(text[, n])")
      }),
    ("token_fingerprint",
      info("token_fingerprint", "token_fingerprint(tokens) - order-sensitive rolling-hash fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => TokenFingerprint(t)
        case _ => throw new IllegalArgumentException("token_fingerprint(tokens)")
      }),
    ("hyperplane_bands",
      info("hyperplane_bands", "hyperplane_bands(vec[, planes, bands]) - banded random-hyperplane LSH signatures"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => HyperplaneBands(v, 8, 4, 0)
        case Seq(v, p, b) =>
          HyperplaneBands(v, intArg(p, "hyperplane_bands"),
            intArg(b, "hyperplane_bands"), 0)
        case _ => throw new IllegalArgumentException(
          "hyperplane_bands(vec[, planes, bands])")
      }),
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double vectors"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSim(a, b)
        case _ => throw new IllegalArgumentException("cosine_sim(a, b)")
      }),
    ("repetition_stats",
      info("repetition_stats", "repetition_stats(tokens) - struct(d2, d3, top): distinct bigram/trigram counts and top token frequency"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => RepetitionStats(t)
        case _ => throw new IllegalArgumentException("repetition_stats(tokens)")
      }),
    ("token_entropy",
      info("token_entropy", "token_entropy(tokens) - Shannon entropy (bits) of the token distribution"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => TokenEntropy(t)
        case _ => throw new IllegalArgumentException("token_entropy(tokens)")
      }))

  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
