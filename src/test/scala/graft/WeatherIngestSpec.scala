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

  // ---- S1 HTTP fetch contract, against a local stub server ----

  /** An upstream-shaped payload (no `_meta` — the fetcher appends it). */
  private val upstreamPayload: String =
    """{"latitude": -23.5505, "longitude": -46.6333,
      | "hourly": {
      |   "time": ["2025-08-20T00:00", "2025-08-20T01:00"],
      |   "temperature_2m": [17.1, 16.8],
      |   "relative_humidity_2m": [82.0, 84.0]}}""".stripMargin

  private def withStubServer(status: Int, body: String)(
      f: (String, () => String) => Unit): Unit = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    @volatile var lastUri: String = null
    server.createContext("/v1/forecast", (ex: HttpExchange) => {
      lastUri = ex.getRequestURI.toString
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}/v1/forecast",
      () => lastUri)
    finally server.stop(0)
  }

  test("fetch: GET carries the reference's exact query params") {
    withStubServer(200, upstreamPayload) { (base, lastUri) =>
      WeatherIngest.fetchOpenMeteoJson(base, "-23.5505", "-46.6333",
        now = java.time.Instant.parse("2025-08-20T03:00:00Z"))
      val uri = lastUri()
      assert(uri.contains("latitude=-23.5505"))
      assert(uri.contains("longitude=-46.6333"))
      assert(uri.contains("hourly=temperature_2m,relative_humidity_2m"))
      assert(uri.contains("timezone=UTC"))
    }
  }

  test("fetch -> parse end-to-end: _meta lands in every staged row") {
    withStubServer(200, upstreamPayload) { (base, _) =>
      val json = WeatherIngest.fetchOpenMeteoJson(base, "-23.5505", "-46.6333",
        now = java.time.Instant.parse("2025-08-20T03:00:00Z"))
      val rows = WeatherIngest.fromPayloads(spark, Seq(json)).collect()
      assert(rows.length === 2)
      assert(rows.forall(_.getString(3) === "-23.5505")) // lat
      assert(rows.forall(_.getString(4) === "-46.6333")) // lon
      assert(rows.forall(
        _.getTimestamp(5).toInstant.toString === "2025-08-20T03:00:00Z"))
      assert(rows.forall(!_.isNullAt(0))) // both timestamps parse
    }
  }

  test("fetch: non-2xx raises (requests.raise_for_status analog)") {
    withStubServer(503, "upstream sad") { (base, _) =>
      val e = intercept[java.io.IOException] {
        WeatherIngest.fetchOpenMeteoJson(base, "-23.5505", "-46.6333")
      }
      assert(e.getMessage.contains("503"))
    }
  }
}
