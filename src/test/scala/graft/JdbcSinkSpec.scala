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
              case "executeQuery" => log(key, "executeQuery"); null
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

/** Materializing fake warehouse: a shared in-memory table with REAL
  * transactional apply — `commit` publishes the txn's ordered ops
  * (hour-slice DELETEs, INSERTs) atomically under the table lock,
  * `rollback` discards them. Where [[RecordingJdbc]] pins statement
  * SEQUENCING, this pins ROW COUNTS — the exactly-once property the
  * distributed sink claims under Spark task retries. */
object FakeWarehouse {
  type Row4 = (Long, Option[Double], Option[Double], Option[Long])

  private val tables =
    new ConcurrentHashMap[String, scala.collection.mutable.ArrayBuffer[Row4]]()

  private def table(key: String) =
    tables.computeIfAbsent(key,
      _ => scala.collection.mutable.ArrayBuffer.empty[Row4])

  def rows(key: String): Seq[Row4] =
    table(key).synchronized(table(key).toVector).sorted(
      Ordering.by((r: Row4) => (r._1, r._2.getOrElse(Double.NaN).toString)))

  private sealed trait Op
  private case object DeleteDay extends Op
  private case class DeleteHour(h: Int) extends Op
  private case class Insert(r: Row4) extends Op

  private def hourOf(tsMillis: Long): Int =
    new java.sql.Timestamp(tsMillis).toLocalDateTime.getHour

  private def proxy[T](cls: Class[T])(h: (Method, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          h(m, args)
      }).asInstanceOf[T]

  /** `failFirstRealBatch = true` injects a mid-write failure: the first
    * INSERT executeBatch that carries staged rows throws, the way a
    * lost executor or wire error kills an attempt mid-transaction. */
  def connection(key: String,
      failFirstRealBatch: Boolean = false): java.sql.Connection = {
    val ops = scala.collection.mutable.ArrayBuffer.empty[Op]
    val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
    proxy(classOf[java.sql.Connection]) { (m, args) =>
      m.getName match {
        case "createStatement" =>
          proxy(classOf[java.sql.Statement]) { (sm, _) =>
            if (sm.getName == "execute") java.lang.Boolean.TRUE else null
          }
        case "prepareStatement" =>
          val sql = args(0).toString
          val isInsert = sql.trim.startsWith("INSERT")
          val isHourDelete = sql.contains("EXTRACT(HOUR")
          val params = new ConcurrentHashMap[Int, AnyRef]()
          val staged = scala.collection.mutable.ArrayBuffer.empty[Row4]
          proxy(classOf[java.sql.PreparedStatement]) { (pm, pargs) =>
            pm.getName match {
              case "setTimestamp" =>
                params.put(pargs(0).asInstanceOf[Integer].intValue(),
                  pargs(1)); null
              case "setDouble" =>
                params.put(pargs(0).asInstanceOf[Integer].intValue(),
                  pargs(1)); null
              case "setNull" =>
                params.remove(pargs(0).asInstanceOf[Integer].intValue())
                null
              case "setDate" | "setInt" =>
                params.put(pargs(0).asInstanceOf[Integer].intValue(),
                  pargs(1)); null
              case "addBatch" =>
                def d(i: Int) = Option(params.get(i))
                  .map(_.asInstanceOf[java.lang.Double].doubleValue())
                def ts(i: Int) = Option(params.get(i))
                  .map(_.asInstanceOf[java.sql.Timestamp].getTime)
                staged += ((ts(1).get, d(2), d(3), ts(4)))
                params.clear(); null
              case "executeBatch" =>
                if (failFirstRealBatch && staged.nonEmpty &&
                    failed.compareAndSet(false, true)) {
                  staged.clear()
                  throw new java.sql.SQLException("wire dropped mid-batch")
                }
                staged.foreach(r => ops += Insert(r)); staged.clear()
                Array.empty[Int]
              case "executeUpdate" =>
                ops += (if (isHourDelete)
                  DeleteHour(params.get(2).asInstanceOf[Integer].intValue())
                else DeleteDay)
                params.clear(); Integer.valueOf(0)
              case _ => null
            }
          }
        case "commit" =>
          val t = table(key)
          t.synchronized {
            ops.foreach {
              case DeleteDay => t.clear()
              case DeleteHour(h) =>
                val keep = t.filterNot(r => hourOf(r._1) == h)
                t.clear(); t ++= keep
              case Insert(r) => t += r
            }
          }
          ops.clear(); null
        case "rollback" => ops.clear(); null
        case "close" => null
        case _ => null
      }
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
    // never eats rows the txn already staged; the advisory lock
    // (executeQuery) is taken BEFORE the DELETE, so a concurrent
    // duplicate attempt blocks before it can read pre-commit state
    assert(rest === List(
      "prepare:INSERT INTO", "prepare:DELETE FROM",
      "prepare:SELECT pg_advisory_xact_lock(?,",
      "executeBatch", "executeQuery", "executeUpdate",
      "addBatch", "addBatch", "executeBatch",
      "commit", "close"))
  }

  test("loadHourPartition: advisory lock precedes the DELETE for EVERY " +
      "hour slice the txn owns (the speculation-safety statement order)") {
    val key = "upsert_lock_order"
    // hours 07/08/09 forced into ONE task txn -> three lock+delete pairs
    JdbcSink.loadHourPartition(hourlyDf.collect().iterator, day,
      () => RecordingJdbc.connection(key))
    val got = RecordingJdbc.entries(key)
    assert(got.count(_ == "executeQuery") === 3, "one lock per owned hour")
    assert(got.count(_ == "executeUpdate") === 3, "one DELETE per owned hour")
    // pairwise order: the i-th lock acquisition strictly precedes the
    // i-th hour DELETE — the property the exactly-once-under-speculation
    // argument rests on (lock, THEN read/delete committed state)
    val locks = got.zipWithIndex.collect { case ("executeQuery", i) => i }
    val dels = got.zipWithIndex.collect { case ("executeUpdate", i) => i }
    locks.zip(dels).foreach { case (l, d) =>
      assert(l < d, s"lock at $l must precede its hour DELETE at $d")
    }
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

  /** Five rows across hours 07/08/09 — multiple hour slices so a retry
    * of one slice can be replayed against the others' committed rows. */
  private def hourlyDf = {
    import spark.implicits._
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2025-08-20 $h%02d:$m%02d:00")
    Seq(
      (ts(7, 0), 17.1, 82.0, ts(12, 0)),
      (ts(7, 30), 16.8, 84.0, ts(12, 0)),
      (ts(8, 0), 18.2, 80.0, ts(12, 0)),
      (ts(8, 30), 18.9, 78.0, ts(12, 0)),
      (ts(9, 0), 19.5, 76.0, ts(12, 0)))
      .toDF("time", "temperature_2m", "relative_humidity_2m",
        "ingested_at")
  }

  private def hourRows(h: Int) = hourlyDf
    .filter(org.apache.spark.sql.functions.hour(
      org.apache.spark.sql.functions.col("time")) === h)
    .collect()

  test("distributed upsert is EXACTLY-ONCE under a task retry after " +
      "commit: replaying a committed hour partition leaves the " +
      "warehouse rows unchanged") {
    val key = "fake_retry_commit"
    JdbcSink.upsertDayDistributed(hourlyDf, day,
      () => FakeWarehouse.connection(key))
    val first = FakeWarehouse.rows(key)
    assert(first.size === 5, s"expected 5 loaded rows, got $first")
    // Spark re-runs the hour-07 task SEQUENTIALLY (task retry after the
    // prior attempt terminated — what the scheduler guarantees with
    // speculation off) — the EXACT function it would re-invoke, on the
    // exact committed rows. Concurrent duplicate attempts are out of
    // scope: the sink's scaladoc requires an advisory lock for
    // speculation-on deployments, an interleaving this atomic-commit
    // fake structurally cannot reproduce.
    JdbcSink.loadHourPartition(hourRows(7).iterator, day,
      () => FakeWarehouse.connection(key))
    assert(FakeWarehouse.rows(key) === first,
      "retry of a committed partition must not duplicate rows")
  }

  test("distributed upsert is EXACTLY-ONCE under a mid-batch failure: " +
      "the failed attempt rolls back to zero rows for its slice, the " +
      "retry lands the slice once, a second retry changes nothing") {
    val key = "fake_retry_fail"
    // attempt 1 dies mid-INSERT-batch: rollback -> nothing published
    intercept[java.sql.SQLException] {
      JdbcSink.loadHourPartition(hourRows(7).iterator, day,
        () => FakeWarehouse.connection(key, failFirstRealBatch = true))
    }
    assert(FakeWarehouse.rows(key).isEmpty,
      "failed attempt must publish nothing")
    // attempt 2 (the scheduler's retry) lands the slice exactly once
    JdbcSink.loadHourPartition(hourRows(7).iterator, day,
      () => FakeWarehouse.connection(key))
    val once = FakeWarehouse.rows(key)
    assert(once.size === 2)
    // a further spurious re-run stays idempotent
    JdbcSink.loadHourPartition(hourRows(7).iterator, day,
      () => FakeWarehouse.connection(key))
    assert(FakeWarehouse.rows(key) === once)
  }
}
