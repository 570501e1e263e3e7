package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.WeatherIngest
import graft.models.WeatherModels

/** Ingest-path edge cases from the reference
  * (`weather_transform.py:18-37`, FIXTURES.md §1). */
class WeatherIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("fixture payload parses to one row per hourly element") {
    val df = WeatherIngest.fromPayloads(spark, Seq(WeatherIngest.fixturePayload))
    assert(df.count() === 3)
    assert(df.columns.toSeq === Seq("time", "temperature_2m",
      "relative_humidity_2m", "lat", "lon", "ingested_at"))
  }

  test("unparseable timestamp becomes null, row preserved (strict=False parity)") {
    val df = WeatherIngest.fromPayloads(spark, Seq(WeatherIngest.fixturePayload))
    assert(df.filter("time IS NULL").count() === 1)
    assert(df.filter("time IS NULL").select("temperature_2m")
      .head().getDouble(0) === 16.5)
  }

  test("metadata literals are attached to every row") {
    val df = WeatherIngest.fromPayloads(spark, Seq(WeatherIngest.fixturePayload))
    assert(df.select("lat").distinct().head().getString(0) === "-23.5505")
    assert(df.filter("ingested_at IS NULL").count() === 0)
  }

  test("empty hourly arrays yield an empty DataFrame with declared schema") {
    val empty =
      """{"hourly": {"time": [], "temperature_2m": [],
        | "relative_humidity_2m": []},
        | "_meta": {"lat": "0", "lon": "0",
        | "ingested_at": "2025-01-01T00:00:00Z"}}""".stripMargin
    val df = WeatherIngest.fromPayloads(spark, Seq(empty))
    assert(df.count() === 0)
    assert(df.schema === WeatherIngest.hourlySchema)
  }

  test("missing hourly block yields an empty DataFrame (guard branch)") {
    val df = WeatherIngest.fromPayloads(spark,
      Seq("""{"_meta": {"lat": "0", "lon": "0", "ingested_at": "x"}}"""))
    assert(df.count() === 0)
  }

  test("daily mart aggregates per calendar day with null-day group") {
    val daily = WeatherModels.daily(
      WeatherIngest.fromPayloads(spark, Seq(WeatherIngest.fixturePayload)))
      .collect()
    assert(daily.length === 2)
    // null day first (bad-timestamp row), then 2025-08-20
    assert(daily(0).isNullAt(0))
    assert(daily(1).getDate(0).toString === "2025-08-20")
    assert(daily(1).getDouble(1) === (17.1 + 16.8) / 2) // avg_temp_c
    assert(daily(1).getDouble(2) === 17.1) // max
    assert(daily(1).getDouble(3) === 16.8) // min
  }

  test("multi-payload ingest unions rows (batch shape)") {
    val df = WeatherIngest.fromPayloads(spark,
      Seq(WeatherIngest.fixturePayload, WeatherIngest.fixturePayload))
    assert(df.count() === 6)
  }
}
