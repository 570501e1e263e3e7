package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ExactQuantiles

/** ExactQuantiles must be BIT-identical to Spark's exact `percentile`
  * aggregate — it replaces that aggregate in contract queries whose
  * oracle hashes replay the percentile interpolation formula, so a
  * single-ulp drift would break the gate. Every comparison here is
  * java.lang.Double.compare equality on raw doubles, no tolerance. */
class ExactQuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0 / 3.0)

  /** Spark's own percentile per group, as the ground truth. */
  private def sparkPercentiles(df: org.apache.spark.sql.DataFrame,
      g: String, x: String): Map[String, Seq[Double]] =
    df.groupBy(col(g).cast("string").as("g"))
      .agg(percentile(col(x), lit(ps.head)).as("p0"),
        ps.tail.zipWithIndex.map { case (p, i) =>
          percentile(col(x), lit(p)).as(s"p${i + 1}") }: _*)
      .collect()
      .map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap

  private def assertBitEqual(got: Map[String, (Long, Seq[Double])],
      want: Map[String, Seq[Double]]): Unit = {
    assert(got.keySet == want.keySet)
    got.foreach { case (g, (_, vs)) =>
      vs.zip(want(g)).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.compare(a, b) == 0,
          s"group $g p=${ps(i)}: got $a want $b (bits " +
            s"${java.lang.Double.doubleToLongBits(a)} vs " +
            s"${java.lang.Double.doubleToLongBits(b)})")
      }
    }
  }

  test("per-source integer lengths: bit-equal to percentile") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("source"), col("n_chars"))
    val got = ExactQuantiles.percentiles(docs, col("source"),
      col("n_chars"), ps, binWidth = 64.0)
    assertBitEqual(got, sparkPercentiles(docs, "source", "n_chars"))
  }

  test("global continuous doubles: bit-equal to percentile") {
    val lp = graft.operators.TextAnalysis.unigramLogProb(spark, sf)
      .select(lit("").as("g"), col("mean_logprob"))
    val got = ExactQuantiles.percentiles(lp, col("g"),
      col("mean_logprob"), ps, binWidth = 0.0625)
    assertBitEqual(got, sparkPercentiles(lp, "g", "mean_logprob"))
  }

  test("selectCap=1 forces refinement + row_number select; still " +
      "bit-equal") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("source"), col("n_chars"))
    val got = ExactQuantiles.percentiles(docs, col("source"),
      col("n_chars"), ps, binWidth = 1024.0, selectCap = 1L)
    assertBitEqual(got, sparkPercentiles(docs, "source", "n_chars"))
  }

  test("heavy duplicates and a constant group: bit-equal") {
    // hash-derived values: deterministic, many exact duplicates (mod 7),
    // plus a group where every value is identical (degenerate bins)
    val df = spark.range(0, 5000)
      .select(col("id"), (col("id") % 3).cast("string").as("g"))
      .select(col("g"),
        when(col("g") === "2", lit(42.0))
          .otherwise((col("id") % 7).cast("double") +
            (col("id") % 13).cast("double") / 16.0).as("x"))
    val got = ExactQuantiles.percentiles(df, col("g"), col("x"), ps,
      binWidth = 0.5)
    assertBitEqual(got, sparkPercentiles(df, "g", "x"))
  }

  test("property: random grouped data (duplicates, negatives, skew) " +
      "stays bit-equal to percentile across seeds and bin widths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      g <- Gen.choose(0, 3)
      // mixture: a coarse grid (exact ties), a skewed cluster packed
      // into one bin, and negatives — the shapes that stress bin
      // boundaries, min/max short-circuits, and the refinement path
      x <- Gen.frequency(
        3 -> Gen.choose(0, 40).map(_.toDouble / 4.0),
        2 -> Gen.choose(0, 1000).map(i => 7.0 + i.toDouble / 65536.0),
        1 -> Gen.choose(-500, 0).map(_.toDouble / 8.0))
    } yield (g.toString, x)
    for (seed <- 1L to 4L; binWidth <- Seq(0.25, 16.0)) {
      val rows = Gen.listOfN(2000, rowGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
      import spark.implicits._
      val df = rows.toDF("g", "x")
      val got = ExactQuantiles.percentiles(df, col("g"), col("x"), ps,
        binWidth, selectCap = 64L)
      assertBitEqual(got, sparkPercentiles(df, "g", "x"))
    }
  }

  test("n is the exact per-group row count") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("source"), col("n_chars"))
    val got = ExactQuantiles.percentiles(docs, col("source"),
      col("n_chars"), Seq(0.5), binWidth = 64.0)
    val want = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map { case (g, (n, _)) => g -> n } == want)
  }
}
