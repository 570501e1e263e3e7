package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
