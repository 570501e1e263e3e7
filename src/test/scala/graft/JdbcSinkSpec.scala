package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.WeatherIngest
import graft.store.JdbcSink

/** Recording `java.sql.Connection` built from dynamic proxies: no RDBMS in
  * the container, so the tests pin the statement SEQUENCING contract —
  * idempotent DDL, day-scoped DELETE, batched INSERT, COMMIT, and
  * rollback-on-failure (`weather_hourly_pipeline.py:92-112` semantics).
  *
  * Logs live in a static registry keyed by test, because the distributed
  * variant's connections open inside executor tasks (same JVM under
  * local[*], but the closure is still serialized — a captured queue would
  * be a deserialized copy).
  */
object RecordingJdbc {
  private val logs = new ConcurrentHashMap[String, ConcurrentLinkedQueue[String]]()

  def log(key: String, msg: String): Unit =
    logs.computeIfAbsent(key, _ => new ConcurrentLinkedQueue[String]()).add(msg)

  def entries(key: String): List[String] = {
    val q = logs.get(key)
    if (q == null) Nil else q.asScala.toList
  }

  private def proxy[T](cls: Class[T])(h: (Method, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          h(m, args)
      }).asInstanceOf[T]

  private def default(m: Method): AnyRef = m.getReturnType match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case _ => null
  }

  /** First two words of the SQL — enough to distinguish CREATE TABLE /
    * DELETE FROM / INSERT INTO in the log. */
  private def verb(sql: String): String =
    sql.trim.split("\\s+").take(2).mkString(" ")

  def connection(key: String, failOnInsertBatch: Boolean = false): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) { (m, args) =>
      m.getName match {
        case "createStatement" =>
          proxy(classOf[java.sql.Statement]) { (sm, sargs) =>
            sm.getName match {
              case "execute" =>
                log(key, "exec:" + verb(sargs(0).toString))
                java.lang.Boolean.TRUE
              case _ => default(sm)
            }
          }
        case "prepareStatement" =>
          val sql = args(0).toString
          log(key, "prepare:" + verb(sql))
          val isInsert = sql.trim.startsWith("INSERT")
          proxy(classOf[java.sql.PreparedStatement]) { (pm, _) =>
            pm.getName match {
              case "addBatch" => log(key, "addBatch"); null
              case "executeBatch" =>
                if (failOnInsertBatch && isInsert) {
                  log(key, "executeBatch:boom")
                  throw new java.sql.SQLException("boom")
                }
                log(key, "executeBatch")
                Array.empty[Int]
              case "executeUpdate" => log(key, "executeUpdate"); Integer.valueOf(0)
              case n if n.startsWith("set") => null
              case _ => default(pm)
            }
          }
        case "commit" => log(key, "commit"); null
        case "rollback" => log(key, "rollback"); null
        case "close" => log(key, "close"); null
        case _ => default(m)
      }
    }
}

class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val day = java.sql.Date.valueOf("2025-08-20")

  /** Fixture payload parses to 3 rows, ONE with null time (lenient parse of
    * "not-a-timestamp") — the null-time filter must drop exactly that one. */
  private def fixtureDf =
    WeatherIngest.fromPayloads(spark, Seq(WeatherIngest.fixturePayload))

  test("upsertDay: DDL -> day DELETE -> batched INSERT -> COMMIT, in order") {
    val key = "upsert_order"
    JdbcSink.upsertDay(fixtureDf, day, () => RecordingJdbc.connection(key))
    val got = RecordingJdbc.entries(key)
    assert(got === List(
      "exec:CREATE TABLE",
      "prepare:DELETE FROM", "executeUpdate",
      "prepare:INSERT INTO", "addBatch", "addBatch", "executeBatch",
      "commit", "close"))
  }

  test("upsertDay: null-time rows are excluded from the batch") {
    val key = "upsert_nulltime"
    JdbcSink.upsertDay(fixtureDf, day, () => RecordingJdbc.connection(key))
    // 3 fixture rows, 1 unparseable timestamp -> 2 addBatch calls
    assert(RecordingJdbc.entries(key).count(_ == "addBatch") === 2)
  }

  test("upsertDay: failure inside the txn rolls back, never commits") {
    val key = "upsert_rollback"
    val e = intercept[java.sql.SQLException] {
      JdbcSink.upsertDay(fixtureDf, day,
        () => RecordingJdbc.connection(key, failOnInsertBatch = true))
    }
    assert(e.getMessage === "boom")
    val got = RecordingJdbc.entries(key)
    assert(!got.contains("commit"))
    assert(got.takeRight(2) === List("rollback", "close"))
  }

  test("upsertDayDistributed: driver txn preps the day, executors batch-insert") {
    val key = "upsert_dist"
    JdbcSink.upsertDayDistributed(fixtureDf.repartition(2), day,
      () => RecordingJdbc.connection(key), batchSize = 1)
    val got = RecordingJdbc.entries(key)
    // driver connection: DDL + day delete committed before any insert
    assert(got.take(5) === List(
      "exec:CREATE TABLE", "prepare:DELETE FROM", "executeUpdate",
      "commit", "close"))
    val rest = got.drop(5)
    assert(!rest.exists(_.startsWith("exec:CREATE")), "DDL ran once, on the driver")
    assert(rest.count(_ == "addBatch") === 2, "null-time row filtered")
    // every executor connection commits (>= 1 partition had rows)
    assert(rest.count(_ == "commit") >= 1)
    assert(rest.count(_ == "commit") === rest.count(_.startsWith("prepare:INSERT")))
  }

  test("upsertDayDistributed: task txn deletes its hour slice before inserting") {
    import spark.implicits._
    val key = "upsert_dist_hourslice"
    // two rows in the SAME hour -> one hour-partition -> deterministic log
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2025-08-20 07:$m%02d:00")
    val df = Seq(
      (ts(0), 17.1, 82.0, ts(30)),
      (ts(15), 16.8, 84.0, ts(30)))
      .toDF("time", "temperature_2m", "relative_humidity_2m", "ingested_at")
    JdbcSink.upsertDayDistributed(df, day, () => RecordingJdbc.connection(key))
    val rest = RecordingJdbc.entries(key).drop(5) // past the driver prep txn
    // the hour-scoped DELETE runs inside the task txn BEFORE that hour's
    // inserts — so a task retry first wipes what its earlier attempt
    // committed (retry-idempotence), and the flush-before-delete ordering
    // never eats rows the txn already staged
    assert(rest === List(
      "prepare:INSERT INTO", "prepare:DELETE FROM",
      "executeBatch", "executeUpdate",
      "addBatch", "addBatch", "executeBatch",
      "commit", "close"))
  }

  test("upsertDayDistributed: one hour-slice DELETE per distinct hour") {
    val key = "upsert_dist_hours"
    // fixture rows span hours 00 and 01 -> two hour slices
    JdbcSink.upsertDayDistributed(fixtureDf, day,
      () => RecordingJdbc.connection(key))
    val rest = RecordingJdbc.entries(key).drop(5)
    assert(rest.count(_ == "executeUpdate") === 2, "one DELETE per owned hour")
    assert(rest.count(_.startsWith("prepare:DELETE")) ===
      rest.count(_.startsWith("prepare:INSERT")), "hour DELETE prepared per task txn")
  }

  test("upsertDayDistributed: executor failure rolls back its partition") {
    val key = "upsert_dist_rollback"
    intercept[Exception] {
      JdbcSink.upsertDayDistributed(fixtureDf.coalesce(1), day,
        () => RecordingJdbc.connection(key, failOnInsertBatch = true))
    }
    val got = RecordingJdbc.entries(key)
    assert(got.contains("rollback"))
    assert(got.count(_ == "commit") === 1, "only the driver's prep txn committed")
  }
}
