package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.store.PartitionedStore
import graft.streaming.HourlyStream

/** Streaming = batch equivalence + idempotent streaming upsert (U1). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed 1-day window equals the batch group-by") {
    val streamed = HourlyStream.runDailyAggOnce(spark, TestSpark.sf)
      .collect()
    // batch side needs the ns->us loader; reuse Tables.load for parity
    val ev = graft.Tables.load(spark, TestSpark.sf, "events")
    ev.createOrReplaceTempView("ev_tmp")
    val expect = spark.sql(
      """SELECT to_date(ts) AS day, event_type, count(*) n,
        | CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) s
        | FROM ev_tmp GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)
      .collect()
    assert(streamed.length === expect.length)
    streamed.zip(expect).foreach { case (a, b) =>
      assert(a.getDate(0) === b.getDate(0))
      assert(a.getString(1) === b.getString(1))
      assert(a.getLong(2) === b.getLong(2))
      assert(a.getDouble(3) === b.getDouble(3))
    }
  }

  test("streaming dedup: duplicate event_ids collapse to the batch distinct") {
    val streamed = HourlyStream.runDedupOnce(spark, TestSpark.sf).count()
    val exact = graft.Tables.load(spark, TestSpark.sf, "events")
      .select("event_id", "ts").distinct().count()
    assert(streamed === exact)
  }

  test("mapGroupsWithState: final per-user counts equal the batch group-by") {
    val stateful = HourlyStream.runningUserCounts(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.Tables.load(spark, TestSpark.sf, "events")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stateful === batch)
  }

  test("foreachBatch streaming upsert lands in the partitioned warehouse") {
    val warehouse = Files.createTempDirectory("graft_wh_").toString
    val ckpt = Files.createTempDirectory("graft_ck_").toString
    // AvailableNow: drain everything, then terminate (the 1-hour
    // production trigger would leave processAllAvailable waiting on a
    // batch an hour away).
    val q = HourlyStream.continuousDailyUpsert(
      spark, TestSpark.sf, warehouse, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      q.awaitTermination(120000L)
    } finally {
      q.stop()
    }
    val back = PartitionedStore.read(spark, warehouse)
    assert(back.count() > 0)
    assert(back.columns.contains("date"))
    // re-delivery idempotence: partition count equals distinct days
    val days = back.select("date").distinct().count()
    val dirs = new java.io.File(warehouse).listFiles()
      .count(_.getName.startsWith("date="))
    assert(days.toInt === dirs)
  }
}
