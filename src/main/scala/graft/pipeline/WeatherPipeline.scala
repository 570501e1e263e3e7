package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.WeatherIngest
import graft.models.WeatherModels
import graft.store.PartitionedStore

/** The reference's whole DAG (`weather_hourly_pipeline.py:37-128`) as one
  * Spark job: fetch -> transform -> store -> load -> models. Airflow task
  * edges collapse into plan edges; the XCom string hop (S3) disappears —
  * stages chain as DataFrames (SURVEY.md §3.1).
  *
  * The HTTP fetch (S1) is driver-side by design (a single-request source;
  * SURVEY.md §2.1 rules a DataSourceV2 overkill): `runLive` performs the
  * reference's GET via `WeatherIngest.fetchOpenMeteoJson` (params, 30 s
  * timeout, raise-on-non-2xx, `_meta` enrichment); `run` accepts the
  * payload string directly so tests and offline environments inject
  * fixtures. */
object WeatherPipeline {

  case class Result(rows: Long, batchDay: Option[java.sql.Date],
      warehousePath: String)

  /** End-to-end run for one batch payload. Mirrors the reference's task
    * sequence with the same empty-payload guard (P5) and min-date batch
    * key (A1); the store step is the idempotent day-overwrite (U1). */
  def run(spark: SparkSession, payload: String,
      warehousePath: String): Result = {
    val hourly = WeatherIngest.fromPayloads(spark, Seq(payload))
    if (hourly.isEmpty) {
      Result(0L, None, warehousePath) // weather_hourly_pipeline.py:63-64
    } else {
      val day = hourly.agg(min(to_date(col("time")))).first().getDate(0)
      // rows with unparseable time (null) keep the reference's behavior of
      // loading them; they land in the null-date partition
      PartitionedStore.upsertDaily(hourly, warehousePath)
      Result(hourly.count(), Option(day), warehousePath)
    }
  }

  /** The mart over everything loaded so far (dbt_run step: view-layer
    * recompute on read). */
  def dailyMart(spark: SparkSession, warehousePath: String): DataFrame =
    WeatherModels.daily(PartitionedStore.read(spark, warehousePath))

  /** Live-fetch variant: the full reference DAG including the HTTP GET
    * (S1). `fetch` defaults to the real Open-Meteo call and is injectable
    * so tests point it at a stub server (`WeatherIngestSpec` exercises
    * the fetch contract itself; `PipelinePropertySpec` the stages). */
  def runLive(spark: SparkSession, warehousePath: String,
      fetch: () => String = () => WeatherIngest.fetchOpenMeteoJson()): Result =
    run(spark, fetch(), warehousePath)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft_weather_wh_").toString
    val r = run(spark, WeatherIngest.fixturePayload, wh)
    println(s"[pipeline] loaded rows=${r.rows} day=${r.batchDay} wh=$wh")
    dailyMart(spark, wh).show(truncate = false)
    spark.stop()
  }
}
