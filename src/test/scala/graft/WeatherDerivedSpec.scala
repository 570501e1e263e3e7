package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.models.WeatherModels

/** Roadmap derived measures (`reference/README.md:197-198`): the Magnus
  * dew point and no-wind Steadman apparent temperature are checked
  * against independently hand-computed values, the sanity flags against
  * the roadmap's stated ranges (`README.md:192`), and the daily mart
  * against its planted extreme count and grid geometry. */
class WeatherDerivedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def derivedRow(t: Double, rh: Double) =
    WeatherModels.derivedHourly(Seq((t, rh)).toDF("t", "rh"))
      .select("dew_point_c", "feels_like_c", "is_extreme").head()

  test("dew point and feels-like match hand-computed Magnus/Steadman " +
      "values at t=20C rh=50%") {
    val r = derivedRow(20.0, 50.0)
    // gamma = ln(0.5) + 17.27*20/257.7 = 0.647171...
    // dew  = 237.7*gamma/(17.27-gamma) = 9.2543...
    assert(math.abs(r.getDouble(0) - 9.2543) < 0.001)
    // e = 0.5*6.105*exp(1.340318) = 11.6618 hPa
    // feels = 20 + 0.33*e - 4.0 = 19.8484
    assert(math.abs(r.getDouble(1) - 19.8484) < 0.001)
    assert(!r.getBoolean(2))
  }

  test("dew point never exceeds air temperature when rh <= 100") {
    val rows = WeatherModels.derivedHourly(
      (for (t <- -30 to 50 by 5; rh <- 5 to 100 by 5)
        yield (t.toDouble, rh.toDouble)).toDF("t", "rh"))
      .select("t", "rh", "dew_point_c").collect()
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(0) + 1e-9,
        s"dew > t at t=${r.getDouble(0)} rh=${r.getDouble(1)}")
    }
  }

  test("extreme flags fire exactly on the roadmap sanity ranges") {
    assert(derivedRow(72.5, 50.0).getBoolean(2))   // temp > 60
    assert(derivedRow(-85.0, 50.0).getBoolean(2))  // temp < -80
    assert(derivedRow(20.0, 104.0).getBoolean(2))  // rh > 100
    assert(!derivedRow(60.0, 100.0).getBoolean(2)) // boundary is sane
  }

  test("daily mart: 30 days x 24 hours, planted extremes counted, " +
      "amplitude consistent") {
    val d = WeatherModels.derivedDaily(spark, TestSpark.sf)
    val rows = d.collect()
    assert(rows.length === 30)
    assert(rows.forall(_.getLong(1) === 24L), "n_hours != 24")
    // planted: i%97==0 (8 rows) + i%131==0 (6 rows) - overlap at i=0
    val extremes = rows.map(_.getLong(6)).sum
    assert(extremes === 13L, s"extreme count $extremes != 13")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, "negative amplitude")
      assert(r.getDouble(5) >= r.getDouble(4),
        "max feels-like below the daily mean")
    }
  }
}
