package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.WeatherIngest
import graft.pipeline.WeatherPipeline

/** ScalaCheck properties promised in SURVEY.md §5: row-count conservation
  * of the transform and idempotence of the day-overwrite load. Generators
  * are driven by fixed seeds (the scalatestplus bridge is not in the
  * offline cache) — deterministic, still property-shaped. */
class PipelinePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def payload(times: Seq[String], temps: Seq[Double],
      rhs: Seq[Double]): String = {
    def arr(xs: Seq[String]) = xs.mkString("[", ",", "]")
    s"""{"hourly": {"time": ${arr(times.map("\"" + _ + "\""))},
       | "temperature_2m": ${arr(temps.map(_.toString))},
       | "relative_humidity_2m": ${arr(rhs.map(_.toString))}},
       | "_meta": {"lat": "1.0", "lon": "2.0",
       | "ingested_at": "2025-01-01T00:00:00Z"}}""".stripMargin
  }

  private val hourGen: Gen[(String, Double, Double)] = for {
    day <- Gen.choose(1, 28)
    hour <- Gen.choose(0, 23)
    bad <- Gen.frequency(9 -> false, 1 -> true)
    temp <- Gen.choose(-40.0, 45.0)
    rh <- Gen.choose(0.0, 100.0)
  } yield (
    if (bad) "garbage" else f"2025-06-$day%02dT$hour%02d:00",
    math.rint(temp * 100) / 100, math.rint(rh * 100) / 100)

  private def sample(n: Int, seed: Long): List[(String, Double, Double)] =
    Gen.listOfN(n, hourGen)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("property: transform preserves row count = len(hourly.time)") {
    for (seed <- 1L to 5L) {
      val rows = sample(20, seed)
      val df = WeatherIngest.fromPayloads(spark,
        Seq(payload(rows.map(_._1), rows.map(_._2), rows.map(_._3))))
      assert(df.count() === rows.length, s"seed=$seed")
      // lenient parse: bad timestamps become nulls, never dropped rows
      assert(df.filter("time IS NULL").count() ===
        rows.count(_._1 == "garbage"), s"seed=$seed")
    }
  }

  test("property: load . load = load (day-overwrite idempotence)") {
    for (seed <- 10L to 12L) {
      val rows = sample(12, seed)
      val wh = Files.createTempDirectory("graft_prop_wh_").toString
      val p = payload(rows.map(_._1), rows.map(_._2), rows.map(_._3))
      WeatherPipeline.run(spark, p, wh)
      val once = WeatherPipeline.dailyMart(spark, wh).collect().toSeq
      WeatherPipeline.run(spark, p, wh) // re-deliver the same batch
      val twice = WeatherPipeline.dailyMart(spark, wh).collect().toSeq
      assert(once === twice, s"seed=$seed")
    }
  }

  test("empty payload short-circuits (P5 guard)") {
    val wh = Files.createTempDirectory("graft_prop_wh_").toString
    val r = WeatherPipeline.run(spark, payload(Nil, Nil, Nil), wh)
    assert(r.rows === 0L && r.batchDay.isEmpty)
  }

  test("runLive: fetch -> transform -> store -> mart against a stub server") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val body =
      """{"latitude": -23.5505, "longitude": -46.6333,
        | "hourly": {
        |   "time": ["2025-08-21T00:00", "2025-08-21T01:00"],
        |   "temperature_2m": [20.0, 22.0],
        |   "relative_humidity_2m": [70.0, 72.0]}}""".stripMargin
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/v1/forecast", (ex: HttpExchange) => {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://localhost:${server.getAddress.getPort}/v1/forecast"
      val wh = Files.createTempDirectory("graft_live_wh_").toString
      val r = WeatherPipeline.runLive(spark, wh,
        fetch = () => WeatherIngest.fetchOpenMeteoJson(base, "-23.5505",
          "-46.6333", now = java.time.Instant.parse("2025-08-21T02:00:00Z")))
      assert(r.rows === 2L)
      assert(r.batchDay.map(_.toString).contains("2025-08-21"))
      val mart = WeatherPipeline.dailyMart(spark, wh).collect()
      assert(mart.length === 1)
      assert(mart(0).getDouble(1) === 21.0) // avg temp
    } finally server.stop(0)
  }
}
