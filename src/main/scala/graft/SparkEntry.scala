package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.WeatherIngest
import graft.models.WeatherModels
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry has a matching `oracleSql` entry (ANSI SQL run by
  * DuckDB on the same parquet tables) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  * Column names and row order are made deterministic on BOTH sides; summed
  * doubles go through exact decimal arithmetic (see Relational.dsum) so
  * results are bit-identical across engines and partitionings.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's mart (daily tumbling aggregate, `weather_daily.sql`)
    * transplanted onto the `events` table. */
  def entry(spark: SparkSession): DataFrame =
    Relational.martDaily(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference surface (weather pipeline shape on `events`) --
    "stg_hourly" -> (Relational.stgHourly _),
    "mart_daily" -> (Relational.martDaily _),
    "batch_day" -> (Relational.batchDay _),
    "day_slice" -> (Relational.daySlice _),
    "row_count" -> (Relational.rowCount _),
    "top5_days" -> (Relational.top5Days _),
    "limit5" -> (Relational.limit5 _),
    "top10_per_day" -> (Relational.top10PerDay _),
    // -- ingest path on the canonical fixture payload (constant oracle) --
    "weather_fixture_daily" -> ((s: SparkSession, _: String) =>
      WeatherModels.daily(
        WeatherIngest.fromPayloads(s, Seq(WeatherIngest.fixturePayload)))),
    // -- TPC-H-shaped relational coverage --
    "q1_pricing" -> (Relational.q1Pricing _),
    "segment_revenue" -> (Relational.segmentRevenue _),
    "q3_shipping" -> (Relational.q3Shipping _),
    "q5_region" -> (Relational.q5Region _),
  )

  /** DuckDB-dialect ANSI SQL oracles, one per oracle-expressible query.
    * Numeric discipline mirrors Relational.dsum/davg exactly. */
  def oracleSql: Map[String, String] = Map(
    "stg_hourly" ->
      """SELECT event_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_utc,
        | CAST(ts AS DATE) AS date_utc, event_type, value
        | FROM events ORDER BY event_id""".stripMargin.replace("\n", ""),
    "mart_daily" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)/count(value) AS avg_value,
        | max(value) AS max_value, min(value) AS min_value,
        | CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", ""),
    "batch_day" ->
      "SELECT min(CAST(ts AS DATE)) AS batch_day FROM events",
    "day_slice" ->
      """SELECT event_id, event_type, value FROM events
        | WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        | ORDER BY event_id""".stripMargin.replace("\n", ""),
    "row_count" ->
      "SELECT count(*) AS n_rows FROM events",
    "top5_days" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n_events FROM events
        | GROUP BY 1 ORDER BY day DESC LIMIT 5""".stripMargin.replace("\n", ""),
    "limit5" ->
      "SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 5",
    "top10_per_day" ->
      """SELECT day, event_id, value, rn FROM (
        | SELECT CAST(ts AS DATE) AS day, event_id, value,
        |  row_number() OVER (PARTITION BY CAST(ts AS DATE)
        |   ORDER BY value DESC, event_id) AS rn
        | FROM events) WHERE rn <= 10 ORDER BY day, rn""".stripMargin.replace("\n", ""),
    "weather_fixture_daily" ->
      """SELECT CAST(NULL AS DATE) AS day,
        |  CAST(16.5 AS DOUBLE) AS avg_temp_c, CAST(16.5 AS DOUBLE) AS max_temp_c,
        |  CAST(16.5 AS DOUBLE) AS min_temp_c, CAST(85.5 AS DOUBLE) AS avg_rh
        | UNION ALL
        | SELECT DATE '2025-08-20',
        |  (CAST(17.1 AS DOUBLE)+CAST(16.8 AS DOUBLE))/2, CAST(17.1 AS DOUBLE),
        |  CAST(16.8 AS DOUBLE), (CAST(82.0 AS DOUBLE)+CAST(84.0 AS DOUBLE))/2
        | ORDER BY day NULLS FIRST""".stripMargin.replace("\n", ""),
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)/count(l_quantity) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)/count(l_extendedprice) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)/count(l_discount) AS avg_disc,
        | count(*) AS count_order
        | FROM lineitem GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", ""),
    "segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.replace("\n", ""),
    "q3_shipping" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        | FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        | ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin.replace("\n", ""),
    "q5_region" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin.replace("\n", ""),
  )
}
