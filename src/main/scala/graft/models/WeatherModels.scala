package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's dbt view layer re-expressed as DataFrame functions
  * (compute-on-read, like `materialized='view'` at `dbt_project.yml:13`).
  *
  * - staging (`dbt/models/staging/stg_weather_hourly.sql`): projection +
  *   rename + date derivation.
  * - mart (`dbt/models/marts/weather_daily.sql`): calendar-day group-by with
  *   avg/max/min aggregates, ordered by day.
  *
  * Both are pure plan builders — Catalyst fuses them with consumers, so a
  * `LIMIT 5` over the mart still prunes and partially aggregates at the scan,
  * exactly the property the reference got from Postgres view inlining
  * (SURVEY.md §3.3). The daily group-by shuffles once on the day key;
  * partial (map-side) aggregation makes the exchange carry one row per
  * (partition, day) — at 100 TB that is days × partitions rows, trivially
  * small.
  */
object WeatherModels {

  /** stg_weather_hourly (`stg_weather_hourly.sql:3-8`): time->time_utc,
    * date(time)->date_utc, pass-through measures. */
  def staging(hourly: DataFrame): DataFrame =
    hourly.select(
      col("time").as("time_utc"),
      to_date(col("time")).as("date_utc"),
      col("temperature_2m"),
      col("relative_humidity_2m"))

  /** weather_daily (`weather_daily.sql:4-12`): daily avg/max/min temperature
    * and avg humidity, sorted by day. */
  def daily(hourly: DataFrame): DataFrame =
    staging(hourly)
      .groupBy(col("date_utc").as("day"))
      .agg(
        avg(col("temperature_2m")).as("avg_temp_c"),
        max(col("temperature_2m")).as("max_temp_c"),
        min(col("temperature_2m")).as("min_temp_c"),
        avg(col("relative_humidity_2m")).as("avg_rh"))
      .orderBy(col("day"))

  /** Derived-measure mart from the reference roadmap
    * (`reference/README.md:197-198`): dew point (Magnus/Tetens form),
    * feels-like (Steadman apparent temperature, no-wind form — the
    * reference contract carries temperature+humidity only), daily
    * amplitude, and the sanity-range extreme flags the roadmap words as
    * expectations (`README.md:192`: -80°C ≤ temp ≤ 60°C, 0–100% RH).
    *
    * Runs over a deterministic 30-day hourly grid (720 rows from
    * `spark.range`; dyadic-rational generators so Spark and the DuckDB
    * oracle see bit-identical inputs at every SF, like
    * `weather_fixture_daily`'s constant oracle), with out-of-range
    * readings planted at i%97==0 / i%131==0 so the extreme-flag path is
    * non-vacuous. Transcendental outputs (ln/exp) are floored at 1e-6
    * per ROW and summed as DECIMAL(28,6) — JVM vs DuckDB libm ulp drift
    * cannot move the hash (the `source_datasheet` discipline).
    *
    * Scale shape: a per-row projection plus one day-keyed partial
    * aggregate; the shuffle carries days × partitions rows. On a real
    * hourly table this is `derivedHourly(hourlyDf)` feeding the same
    * aggregate — the grid exists only to make the oracle closed-form. */
  def derivedDaily(s: SparkSession, dir: String): DataFrame = {
    val i = col("id")
    val grid = s.range(720).select(
      date_add(to_date(lit("2025-07-01")), floor(i / 24).cast("int"))
        .as("day"),
      when(i % 97 === 0, lit(72.5)).otherwise(
        lit(12.0) + (i * 7 % 29).cast("double")
          - (i * 3 % 11).cast("double")
          + (i % 24).cast("double") * lit(0.25)).as("t"),
      when(i % 131 === 0, lit(104.0)).otherwise(
        lit(30.0) + (i * 13 % 66).cast("double")).as("rh"))
    derivedHourly(grid)
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_hours"),
        (max(col("t")) - min(col("t"))).as("amplitude_c"),
        (sum(col("dew_point_c").cast(DecimalType(28, 6))).cast("double")
          / count(lit(1))).as("avg_dew_point_c"),
        (sum(col("feels_like_c").cast(DecimalType(28, 6))).cast("double")
          / count(lit(1))).as("avg_feels_like_c"),
        max(col("feels_like_c")).as("max_feels_like_c"),
        sum(col("is_extreme").cast("long")).as("n_extreme"))
      .orderBy(col("day"))
  }

  /** Per-row derived measures over any frame bearing (`t`, `rh`) in
    * °C / %RH: Magnus dew point, no-wind Steadman apparent temperature
    * (vapor pressure e = rh/100 · 6.105 · exp(17.27·t/(237.7+t)) hPa),
    * and the roadmap sanity flag. Pure codegen'd projection. */
  def derivedHourly(hourly: DataFrame): DataFrame = {
    val t = col("t"); val rh = col("rh")
    val gamma = log(rh / 100.0) + lit(17.27) * t / (lit(237.7) + t)
    val vapor = rh / 100.0 * lit(6.105) *
      exp(lit(17.27) * t / (lit(237.7) + t))
    def micro(c: Column): Column = floor(c * 1000000.0) / 1000000.0
    hourly.withColumns(Map(
      "dew_point_c" -> micro(lit(237.7) * gamma / (lit(17.27) - gamma)),
      "feels_like_c" -> micro(t + lit(0.33) * vapor - lit(4.0)),
      "is_extreme" ->
        (t > 60.0 || t < -80.0 || rh > 100.0 || rh < 0.0)))
  }
}
