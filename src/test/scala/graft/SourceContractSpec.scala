package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.WeatherIngest
import graft.operators.Contract

/** The reference's one automated test, re-expressed: dbt `not_null` on
  * source columns (`/root/reference/dbt/models/sources.yml:9-10`). */
class SourceContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("events source: key columns carry zero nulls") {
    val row = Contract.eventNullContract(spark, TestSpark.sf).head()
    assert(row.getLong(row.fieldIndex("null_event_id")) === 0L)
    assert(row.getLong(row.fieldIndex("null_ts")) === 0L)
    assert(row.getLong(row.fieldIndex("null_event_type")) === 0L)
    assert(row.getLong(row.fieldIndex("null_user_id")) === 0L)
  }

  test("assertNotNull passes on clean columns") {
    Contract.assertNotNull(
      graft.Tables.load(spark, TestSpark.sf, "events"),
      Seq("event_id", "ts", "event_type"))
  }

  test("assertNotNull fails loudly on the fixture's lenient-parse null time") {
    // the fixture deliberately carries one unparseable timestamp — the
    // exact situation dbt's not_null on weather_hourly.time would catch
    val staged = WeatherIngest.fromPayloads(
      spark, Seq(WeatherIngest.fixturePayload))
    val e = intercept[IllegalStateException] {
      Contract.assertNotNull(staged, Seq("time", "temperature_2m"))
    }
    assert(e.getMessage.contains("time (1 null rows)"))
    assert(!e.getMessage.contains("temperature_2m"), "clean column not reported")
  }

  test("nullViolationCounts is one aggregate row with null_<col> names") {
    val df = Contract.nullViolationCounts(
      graft.Tables.load(spark, TestSpark.sf, "events"), Seq("value", "props"))
    assert(df.columns.toSeq === Seq("null_value", "null_props"))
    assert(df.count() === 1L)
  }
}
