package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest stage: Open-Meteo-shaped JSON payload -> typed hourly DataFrame.
  *
  * Re-expresses the reference's transform
  * (`airflow/include/lib/weather_transform.py:4-37` and the `_meta`
  * enrichment at `airflow/dags/weather_hourly_pipeline.py:30-34`) as a
  * declarative Catalyst plan:
  *
  *   payload string -> from_json(explicit schema) -> arrays_zip + explode
  *   -> to_timestamp (lenient: unparseable -> null, matching Polars
  *   `strptime(strict=False)` at `weather_transform.py:32`) -> lit metadata.
  *
  * The JSON payload carries parallel columnar arrays under `hourly`
  * (`weather_transform.py:9-12`); `arrays_zip` + `explode` is the
  * Spark-native rendering of the reference's zip-to-rows construction.
  * At scale the payload column would arrive from a distributed source
  * (Kafka / file drop); everything here is per-row and shuffle-free.
  */
object WeatherIngest {

  /** HTTP fetch with the reference's exact contract
    * (`weather_hourly_pipeline.py:16-35`): GET
    * `base?latitude=..&longitude=..&hourly=temperature_2m,relative_humidity_2m&timezone=UTC`,
    * 30 s timeout, raise on non-2xx, then append the `_meta` block
    * (lat/lon/ingested-at) to the returned JSON. Defaults read the same
    * env vars as the reference. Zero-egress in this container, so tests
    * run it against a local stub server (`WeatherIngestSpec`). */
  def fetchOpenMeteoJson(
      base: String = sys.env.getOrElse("OPEN_METEO_BASE",
        "https://api.open-meteo.com/v1/forecast"),
      lat: String = sys.env.getOrElse("OPEN_METEO_LAT", "-23.5505"),
      lon: String = sys.env.getOrElse("OPEN_METEO_LON", "-46.6333"),
      timeoutSeconds: Long = 30L,
      now: java.time.Instant = java.time.Instant.now()): String = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val url = s"$base?latitude=$lat&longitude=$lon" +
      "&hourly=temperature_2m,relative_humidity_2m&timezone=UTC"
    val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()
    val req = HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .GET()
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} fetching $url") // raise_for_status analog
    appendMeta(resp.body(), lat, lon, now)
  }

  /** Splice the reference's `_meta` enrichment into the payload JSON
    * (`weather_hourly_pipeline.py:29-34`): lat/lon as strings plus a
    * second-precision UTC `ingested_at` ending in `Z`. String splice, not
    * a JSON library round-trip, so the upstream payload bytes pass through
    * untouched. */
  private[ingest] def appendMeta(json: String, lat: String, lon: String,
      now: java.time.Instant): String = {
    val ts = java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      now.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
    val trimmed = json.trim
    require(trimmed.endsWith("}"), "payload is not a JSON object")
    val meta =
      s""""_meta": {"lat": "$lat", "lon": "$lon", "ingested_at": "$ts"}"""
    val body = trimmed.dropRight(1).trim
    if (body.endsWith("{")) body + meta + "}"
    else body + ", " + meta + "}"
  }

  /** Explicit payload schema, mirror of `weather_transform.py:19-23` plus
    * the `_meta` block from `weather_hourly_pipeline.py:30-34`. Arrays stay
    * strings so the lenient timestamp parse happens under our control. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("hourly", StructType(Seq(
      StructField("time", ArrayType(StringType)),
      StructField("temperature_2m", ArrayType(DoubleType)),
      StructField("relative_humidity_2m", ArrayType(DoubleType))))),
    StructField("_meta", StructType(Seq(
      StructField("lat", StringType),
      StructField("lon", StringType),
      StructField("ingested_at", StringType))))))

  /** Ingested base-table schema (`weather_transform.py:19-23`). */
  val hourlySchema: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("temperature_2m", DoubleType),
    StructField("relative_humidity_2m", DoubleType),
    StructField("lat", StringType),
    StructField("lon", StringType),
    StructField("ingested_at", TimestampType)))

  /** Parse a DataFrame bearing a `payload` string column into the typed
    * hourly table. Handles the empty-`hourly` branch
    * (`weather_transform.py:18-23`) naturally: explode of an empty/null
    * zipped array yields no rows, and the schema is declared, not inferred. */
  def parse(payloads: DataFrame): DataFrame = {
    val parsed = payloads
      .select(from_json(col("payload"), payloadSchema).as("p"))
    parsed
      .select(
        // zip the parallel arrays into one array<struct> then explode to rows
        // (reference: row-wise zip at weather_transform.py:25-31)
        explode_outer(arrays_zip(
          col("p.hourly.time"),
          col("p.hourly.temperature_2m"),
          col("p.hourly.relative_humidity_2m"))).as("h"),
        col("p._meta.lat").as("lat"),
        col("p._meta.lon").as("lon"),
        col("p._meta.ingested_at").as("ingested_at_raw"))
      .filter(col("h").isNotNull)
      .select(
        // lenient ISO-8601 parse: bad input -> null (weather_transform.py:32;
        // try_to_timestamp keeps Polars strict=False semantics even under
        // Spark 4's default ANSI mode — SURVEY.md §7.4.3)
        try_to_timestamp(col("h.time")).as("time"),
        col("h.temperature_2m").as("temperature_2m"),
        col("h.relative_humidity_2m").as("relative_humidity_2m"),
        col("lat"), col("lon"),
        try_to_timestamp(col("ingested_at_raw")).as("ingested_at"))
  }

  /** Convenience: parse literal payload strings (driver-side fetch result,
    * the Spark analog of `_fetch_open_meteo_json` at
    * `weather_hourly_pipeline.py:16-35` minus the HTTP call). */
  def fromPayloads(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    parse(payloads.toDF("payload"))
  }

  /** The canonical 3-row fixture from FIXTURES.md §1 (one bad timestamp to
    * exercise the lenient-parse -> null path). */
  val fixturePayload: String =
    """{"latitude": -23.5505, "longitude": -46.6333,
      | "hourly": {
      |   "time": ["2025-08-20T00:00", "2025-08-20T01:00", "not-a-timestamp"],
      |   "temperature_2m": [17.1, 16.8, 16.5],
      |   "relative_humidity_2m": [82.0, 84.0, 85.5]},
      | "_meta": {"lat": "-23.5505", "lon": "-46.6333",
      |           "ingested_at": "2025-08-20T03:00:00Z"}}""".stripMargin
}
