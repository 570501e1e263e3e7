package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.WeatherIngest
import graft.operators.Contract

/** The reference's one automated test, re-expressed: dbt `not_null` on
  * source columns (`/root/reference/dbt/models/sources.yml:9-10`). */
class SourceContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("events source: key columns carry zero nulls") {
    val row = Contract.eventNullContract(spark, TestSpark.sf).head()
    assert(row.getLong(row.fieldIndex("null_event_id")) === 0L)
    assert(row.getLong(row.fieldIndex("null_ts")) === 0L)
    assert(row.getLong(row.fieldIndex("null_event_type")) === 0L)
    assert(row.getLong(row.fieldIndex("null_user_id")) === 0L)
  }

  test("assertNotNull passes on clean columns") {
    Contract.assertNotNull(
      graft.Tables.load(spark, TestSpark.sf, "events"),
      Seq("event_id", "ts", "event_type"))
  }

  test("assertNotNull fails loudly on the fixture's lenient-parse null time") {
    // the fixture deliberately carries one unparseable timestamp — the
    // exact situation dbt's not_null on weather_hourly.time would catch
    val staged = WeatherIngest.fromPayloads(
      spark, Seq(WeatherIngest.fixturePayload))
    val e = intercept[IllegalStateException] {
      Contract.assertNotNull(staged, Seq("time", "temperature_2m"))
    }
    assert(e.getMessage.contains("time (1 null rows)"))
    assert(!e.getMessage.contains("temperature_2m"), "clean column not reported")
  }

  test("nullViolationCounts is one aggregate row with null_<col> names") {
    val df = Contract.nullViolationCounts(
      graft.Tables.load(spark, TestSpark.sf, "events"), Seq("value", "props"))
    assert(df.columns.toSeq === Seq("null_value", "null_props"))
    assert(df.count() === 1L)
  }

  test("unique contract: the primary key verifies, the foreign key is " +
      "measured with reconciling dup accounting") {
    val rows = Contract.uniqueContract(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val pk = rows("o_orderkey")
    assert(pk.getAs[Boolean]("is_unique") &&
      pk.getAs[Long]("n_rows") === pk.getAs[Long]("n_distinct"))
    val fk = rows("o_custkey")
    assert(!fk.getAs[Boolean]("is_unique"))
    // every duplicated key contributes at least 2 of the dup rows
    assert(fk.getAs[Long]("n_dup_rows") >= 2 * fk.getAs[Long]("n_dup_keys"))
    assert(fk.getAs[Long]("n_distinct") < fk.getAs[Long]("n_rows"))
  }

  test("relationships contract: both fact->dim edges hold with zero " +
      "orphans") {
    val rows = Contract.refIntContract(spark, TestSpark.sf).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") === 0L && r.getAs[Boolean]("ok"),
        r.getString(0))
    }
  }

  test("relationships contract: NULL child keys are not orphans (dbt " +
      "parity), true orphans still count") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), None, Some(99L))
      .toDF("fk") // 99 is a true orphan; the null is not_null's business
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Contract.refIntStats(child, "fk", parent, "pk", "t.fk -> p.pk")
      .head()
    assert(r.getAs[Long]("n_child") === 4L)
    assert(r.getAs[Long]("n_orphans") === 1L,
      "exactly the non-null missing key counts as an orphan")
    assert(!r.getAs[Boolean]("ok"))
  }

  test("accepted_values contract: declared values accepted, 'error' " +
      "measured as unexpected") {
    val rows = Contract.acceptedValuesContract(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows("error")._2 === false && rows("error")._1 > 0)
    for (v <- Seq("view", "click", "purchase", "signup"))
      assert(rows(v)._2, s"$v must be accepted")
  }

  test("freshness contract: static corpus sits inside the warn window " +
      "against the pinned as-of date") {
    val r = Contract.freshnessContract(spark, TestSpark.sf).head()
    assert(r.getAs[Int]("days_behind") >= 0)
    assert(r.getAs[Boolean]("within_warn") && r.getAs[Boolean]("within_error"))
  }
}
