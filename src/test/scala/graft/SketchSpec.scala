package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchExpressions
import graft.functions.TextFunctions._

/** Properties of the custom sketch expressions. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("word shingles: distinct n-grams, short docs collapse to one shingle") {
    val df = docsDf(Seq("a b c d", "a b"))
      .select(SketchExpressions.wordShingles(tokens($"text"), 3).as("sh"))
    val out = df.collect().map(_.getSeq[String](0).toSet)
    assert(out(0) === Set("a b c", "b c d"))
    assert(out(1) === Set("a b"))
  }

  test("minhash signature match rate approximates Jaccard similarity") {
    // two docs sharing half their shingles -> expect ~0.5 of the k minima
    // to agree (binomial around J = |A&B|/|A|B|)
    val a = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = ((21 to 60).map(i => s"tok$i")).mkString(" ")
    val sig = docsDf(Seq(a, b))
      .select(SketchExpressions.minhash(
        SketchExpressions.wordShingles(tokens($"text"), 1), 128).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val agree = sig(0).zip(sig(1)).count { case (x, y) => x == y } / 128.0
    val jaccard = 20.0 / 60.0
    assert(math.abs(agree - jaccard) < 0.15, s"agree=$agree jaccard=$jaccard")
  }

  test("identical docs share every band bucket; disjoint docs share none") {
    val sig = docsDf(Seq("x y z w v u t s", "x y z w v u t s",
      "p q r m n o k j"))
      .select(SketchExpressions.minhashBands(
        SketchExpressions.wordShingles(tokens($"text"), 3), 64, 16).as("b"))
      .collect().map(_.getSeq[Long](0))
    assert(sig(0) === sig(1))
    assert(sig(0).intersect(sig(2)).isEmpty)
  }

  test("simhash: identical token seqs equal; near docs within small hamming") {
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val near = (1 to 97).map(i => s"w$i").mkString(" ") + " x1 x2 x3"
    val far = (200 to 300).map(i => s"w$i").mkString(" ")
    val out = docsDf(Seq(base, base, near, far))
      .select(SketchExpressions.simhash(tokens($"text")).as("sh"))
      .collect().map(_.getLong(0))
    assert(out(0) === out(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(0), out(2)) < ham(out(0), out(3)),
      s"near=${ham(out(0), out(2))} far=${ham(out(0), out(3))}")
  }

  test("char ngrams: sliding distinct windows") {
    val out = docsDf(Seq("abcdef"))
      .select(SketchExpressions.charNgramSet(normalizedText($"text"), 5).as("ng"))
      .head().getSeq[String](0)
    assert(out.toSet === Set("abcde", "bcdef"))
  }

  test("fingerprint: order-sensitive, stable") {
    val out = docsDf(Seq("a b c", "a b c", "c b a"))
      .select(fingerprint($"text").as("fp")).collect().map(_.getLong(0))
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
  }

  test("jaccard helper: exact set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(jaccard($"x", $"y").as("j"))
    assert(df.head().getDouble(0) === 0.5)
  }

  test("word gram md5s: bit-identical to the composed transform+md5 " +
      "form, positioned, empty below n tokens") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      Tuple1(Seq("a", "b", "c", "d", "e")),
      Tuple1((1 to 40).map(i => s"t${i % 7}")) // repeats -> dup hashes
    ).toDF("w")
    val composed = df.select(transform(
      sequence(lit(0), size($"w") - 3),
      i => md5(concat_ws(" ", slice($"w", i + 1, lit(3))))).as("g"))
      .collect().map(_.getSeq[String](0))
    val fused = df.select(
      SketchExpressions.wordGramMd5s($"w", 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(fused(0) === composed(0))
    assert(fused(1) === composed(1))
    assert(fused(0).length === 3 && fused(0).distinct.length === 3)
    val short = Seq(Tuple1(Seq("x", "y"))).toDF("w")
      .select(SketchExpressions.wordGramMd5s($"w", 3).as("g"))
      .head().getSeq[String](0)
    assert(short.isEmpty, "below n tokens -> no grams")
  }

  test("hll merge gate: booleans hold, n_exact reconciles, and the " +
      "union is split-invariant (3-way == 2-way == whole)") {
    import org.apache.spark.sql.functions._
    val row = graft.operators.Sketches.hllMergeGate(spark, TestSpark.sf)
      .head()
    assert(row.getBoolean(1), "merged estimate must equal whole-corpus")
    assert(row.getBoolean(2), "estimate must sit within the HLL bound")
    val exact = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("term"))
      .agg(countDistinct(col("term"))).head().getLong(0)
    assert(row.getLong(0) === exact)
    // mergeability is associative: a 3-way split unions to the same
    // estimate as the whole-corpus sketch too
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("term"))
    val whole = docs
      .agg(hll_sketch_estimate(hll_sketch_agg(col("term"), lit(12))))
      .head().getLong(0)
    val threeWay = docs.groupBy(col("doc_id") % 3)
      .agg(hll_sketch_agg(col("term"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    assert(threeWay === whole)
  }
}
