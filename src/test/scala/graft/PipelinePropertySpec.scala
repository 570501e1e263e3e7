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
}
