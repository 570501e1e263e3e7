package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextSources

/** JSONL / CSV corpus source round-trips and malformed-line semantics. */
class TextSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = Tables.load(spark, TestSpark.sf, "documents")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toMap

  test("JSONL round-trip preserves every document") {
    val dir = Files.createTempDirectory("graft_jsonl_").toString + "/docs"
    TextSources.writeJsonl(docs, dir)
    val back = TextSources.readJsonl(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(asMap(back) === asMap(docs))
  }

  test("CSV round-trip preserves every document") {
    val dir = Files.createTempDirectory("graft_csv_").toString + "/docs"
    TextSources.writeCsv(docs, dir)
    val back = TextSources.readCsv(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(asMap(back) === asMap(docs))
  }

  test("permissive mode survives a corrupt line; failfast raises") {
    val dir = Files.createTempDirectory("graft_jsonl_bad_").toString
    Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      ("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""" +
        "\nnot json at all\n").getBytes("UTF-8"))
    val lenient = TextSources.readJsonl(spark, dir).collect()
    assert(lenient.length === 2)
    assert(lenient.count(_.isNullAt(0)) === 1) // corrupt line -> null row
    intercept[org.apache.spark.SparkException] {
      TextSources.readJsonl(spark, dir, failFast = true).collect()
    }
  }
}
