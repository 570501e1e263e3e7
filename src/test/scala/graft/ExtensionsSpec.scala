package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** SQL registration of the custom sketch expressions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sketch functions callable from SQL after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        | size(word_shingles(array('a','b','c','d'), 3)) AS n_sh,
        | size(minhash_signature(array('x','y'), 32)) AS k,
        | simhash64(array('a','b')) AS sh,
        | size(char_ngram_set('abcdef', 5)) AS n_ng,
        | token_fingerprint(array('a','b')) AS fp,
        | repetition_stats(array('a','b','a','b')) AS rs,
        | token_entropy(array('a','a','b','b')) AS ent""".stripMargin).head()
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 32)
    assert(r.getInt(3) === 2)
    assert(r.getLong(4) !== 0L)
    // a b a b: bigrams {a b, b a} of 3; trigrams {a b a, b a b} of 2; top 2
    val rs = r.getStruct(5)
    assert(rs.getInt(0) === 2 && rs.getInt(1) === 2 && rs.getInt(2) === 2)
    // two tokens, equal mass -> exactly 1 bit
    assert(r.getDouble(6) === 1.0)
  }

  test("SQL and DataFrame paths produce identical sketches") {
    GraftExtensions.register(spark)
    import graft.functions.{SketchExpressions, TextFunctions}
    import org.apache.spark.sql.functions.col
    Tables.load(spark, TestSpark.sf, "documents").limit(20)
      .createOrReplaceTempView("docs20")
    val sqlSide = spark.sql(
      """SELECT doc_id, simhash64(filter(split(trim(text), '\\s+'),
        | t -> length(t) > 0)) AS sh FROM docs20""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dfSide = Tables.load(spark, TestSpark.sf, "documents").limit(20)
      .select(col("doc_id"),
        SketchExpressions.simhash(TextFunctions.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlSide === dfSide)
  }

  test("extension class injects functions at session build") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force shared-session init first
    // getOrCreate returns the active session, which would hide the
    // extension path — clear, build a genuinely new session over the same
    // context, then restore.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base)
      val n = s2.sql("SELECT size(char_ngram_set('abcd', 2)) AS n")
        .head().getInt(0)
      assert(n === 3)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
