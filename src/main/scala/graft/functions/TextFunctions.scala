package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.SketchExpressions

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, quality signals, language-ID heuristic, fingerprinting.
  *
  * Everything here is a pure Catalyst expression tree over built-in
  * (codegen'd) functions — no UDFs, so whole-stage codegen stays intact
  * and the operators run at scan speed on a 1000-executor cluster. The
  * reference has no text surface (SURVEY.md §2.7: "no string manipulation
  * on column values"); these are the mandated extension operators.
  */
object TextFunctions {

  /** Whitespace tokens, empty-token-free. */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  /** Whitespace token count (long, to match SQL length() width). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish pre-tokenization: word pieces or single non-word-non-space
    * characters (the classic GPT-2 style pre-split, minus byte fallback). */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c)).cast("long")

  /** Count of punctuation/symbol characters (anything outside
    * [A-Za-z0-9] and whitespace): strip the rest, count what remains. */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("long")

  /** Punctuation chars per character — a standard quality signal. */
  def punctRatio(c: Column): Column =
    punctCount(c).cast("double") / length(c).cast("double")

  /** Mean token length: total non-whitespace chars / token count.
    * (Computed without exploding — one pass, two regex scans.) */
  def avgTokenLen(c: Column): Column =
    length(regexp_replace(c, "\\s", "")).cast("double") /
      tokenCount(c).cast("double")

  /** English stopword list (small, public-domain set). */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

  /** Fraction of tokens that are stopwords (quality signal: natural prose
    * sits near 0.3-0.5; keyword spam near 0). */
  def stopwordRatio(c: Column, stop: Seq[String] = enStopwords): Column = {
    val stopArr = array(stop.map(lit): _*)
    size(filter(tokens(c), t => array_contains(stopArr, t))).cast("double") /
      tokenCount(c).cast("double")
  }

  /** Composite quality score in [0,1]: rewards prose-like stopword density
    * and moderate token length, penalizes punctuation soup. Deterministic
    * double arithmetic (oracle-safe). */
  def qualityScore(c: Column): Column = {
    val sw = stopwordRatio(c)
    val swScore = when(sw > 0.5, lit(1.0) - sw).otherwise(sw) * 2.0
    val punct = lit(1.0) - least(punctRatio(c) * 10.0, lit(1.0))
    val len = least(tokenCount(c).cast("double") / 64.0, lit(1.0))
    Num.t6(swScore * 0.4 + punct * 0.3 + len * 0.3)
  }

  /** Per-language marker-word sets for the n-gram/stopword language-ID
    * heuristic (tiny public stopword samples). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Language-ID: score = marker-token hits per token for each candidate
    * language; argmax wins (ties broken by language code, deterministic).
    * Returns a struct(lang, score). A real system would use char n-gram
    * profiles; the shape (per-language score -> argmax) is identical and
    * fully codegen'd. */
  def langId(c: Column): Column = langIdOnTokens(tokens(c))

  /** [[langId]] over an already-materialized token ATTRIBUTE. The token
    * array is referenced once per language plus once for the length
    * guard; passing `tokens(text)` as an inline expression duplicates
    * that split into every reference (6 regex tokenizations per row —
    * the same re-evaluation hazard [[shingles]] documents for HOF
    * lambdas). Callers on a hot path should project the tokens first —
    * CollapseProject keeps a non-cheap multi-referenced alias
    * materialized, so the two-step select really does evaluate the split
    * once. */
  def langIdOnTokens(toks: Column): Column = {
    val n = greatest(size(toks), lit(1)).cast("double")
    val scored = langMarkers.map { case (code, markers) =>
      val arr = array(markers.map(lit): _*)
      struct(
        (size(filter(toks, t => array_contains(arr, t))).cast("double") / n)
          .as("score"),
        lit(code).as("lang"))
    }
    // array_max on struct orders by (score, lang): highest score wins,
    // lexicographically-last lang on exact ties.
    val best = array_max(array(scored: _*))
    struct(best.getField("lang").as("lang"),
      Num.t6(best.getField("score")).as("score"))
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * token xxhash64 values (custom expression — wrapping long arithmetic
    * is an ANSI-mode error in expression form). Equal fingerprints =>
    * (with overwhelming probability) identical token sequences; cheap
    * first-pass dedup key. */
  def fingerprint(c: Column): Column =
    SketchExpressions.tokenFingerprint(tokens(c))

  /** Word n-gram shingles (default 3) for MinHash/Jaccard dedup.
    *
    * PERFORMANCE CONTRACT: `toks` must be a *materialized column*
    * (attribute), not a complex expression. Expressions referenced inside a
    * higher-order-function lambda are re-evaluated per array element — a
    * `split()` passed here directly would re-tokenize the document once per
    * shingle (O(n^2) regex work per row; observed 100x slowdowns). */
  def shingles(toks: Column, n: Int = 3): Column = {
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(
        transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Character n-gram set (default 5) — the other classic shingle basis.
    * Same contract as [[shingles]]: `s` must be a materialized
    * whitespace-normalized string column. */
  def charNgrams(s: Column, n: Int = 5): Column = {
    val idx = sequence(lit(1), greatest(length(s) - (n - 1), lit(1)))
    array_distinct(transform(idx, i => s.substr(i, lit(n))))
  }

  /** Whitespace-normalized text, the input for [[charNgrams]]. */
  def normalizedText(c: Column): Column = regexp_replace(trim(c), "\\s+", " ")

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }
}
