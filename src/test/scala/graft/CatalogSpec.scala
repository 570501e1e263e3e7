package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.models.Catalog

/** dbt-layer semantics: lazy views, layered names, tag selection,
  * idempotent registration (SURVEY.md §2.10). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registerAll exposes base tables and models as queryable views") {
    Catalog.registerAll(spark, TestSpark.sf)
    assert(spark.sql("SELECT count(*) FROM events").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT * FROM mart_daily_events LIMIT 3").count() === 3)
    // view composition: consumer SQL over the mart view optimizes through
    val top = spark.sql(
      """SELECT day, n_events FROM mart_daily_events
        | ORDER BY day DESC LIMIT 5""".stripMargin)
    assert(top.count() === 5)
  }

  test("tag selection registers only the tagged subset") {
    val s2 = spark.newSession()
    Catalog.registerAll(s2, TestSpark.sf, tag = Some("weather"))
    assert(s2.sql("SELECT count(*) FROM mart_weather_daily").head()
      .getLong(0) === 2)
    assert(s2.catalog.tableExists("stg_weather_hourly"))
    assert(!s2.catalog.tableExists("mart_daily_events"))
  }

  test("tag exclusion skips the excluded subset (dbt --exclude analog)") {
    val s2 = spark.newSession()
    Catalog.registerAll(s2, TestSpark.sf, exclude = Some("weather"))
    assert(s2.catalog.tableExists("mart_daily_events"))
    assert(s2.catalog.tableExists("stg_hourly_events"))
    assert(!s2.catalog.tableExists("mart_weather_daily"))
    assert(!s2.catalog.tableExists("stg_weather_hourly"))
    // exclusion wins over selection on the same tag (dbt semantics)
    val s3 = spark.newSession()
    Catalog.registerAll(s3, TestSpark.sf,
      tag = Some("weather"), exclude = Some("weather"))
    assert(!s3.catalog.tableExists("mart_weather_daily"))
  }

  test("re-registration is idempotent (CREATE OR REPLACE semantics)") {
    Catalog.registerAll(spark, TestSpark.sf)
    Catalog.registerAll(spark, TestSpark.sf)
    assert(spark.sql("SELECT count(*) FROM stg_hourly_events")
      .head().getLong(0) > 0)
  }

  test("testSources passes on the declared contracts (dbt test analog)") {
    Catalog.registerAll(spark, TestSpark.sf)
    Catalog.testSources(spark) // throws on violation
  }

  test("testSources fails loudly when a contract is broken") {
    Catalog.registerAll(spark, TestSpark.sf)
    // registering a view that violates its declared contract
    spark.sql("SELECT CAST(NULL AS BIGINT) AS event_id, " +
        "CAST(NULL AS TIMESTAMP) AS hour_utc, 'x' AS event_type")
      .createOrReplaceTempView("stg_hourly_events")
    try {
      val e = intercept[IllegalStateException] {
        Catalog.testSources(spark)
      }
      assert(e.getMessage.contains("event_id"))
    } finally Catalog.registerAll(spark, TestSpark.sf) // restore
  }
}
