package graft.store

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame

/** JDBC warehouse sink (SURVEY.md §2.1 S7/S8 + §2.6 U1): the reference
  * loads each batch into Postgres with idempotent DDL and a
  * delete-then-insert of the batch day inside one transaction
  * (`weather_hourly_pipeline.py:92-112`).
  *
  * `DataFrameWriter.jdbc` cannot scope a delete, so the day-overwrite
  * variant runs the transaction per partition over the JDBC wire:
  * CREATE TABLE IF NOT EXISTS (U2) once, then DELETE day + batched INSERT
  * (S8's executemany == addBatch/executeBatch) and COMMIT. The primary
  * warehouse in this engine is the Parquet store (PartitionedStore), which
  * expresses the same semantics natively via dynamic partition overwrite —
  * SURVEY.md §7.4.2; this sink exists for reference-parity when a real
  * RDBMS target is configured.
  *
  * NOT exercised by the driver gates: the container has no RDBMS and no
  * JDBC driver on the classpath (zero egress). The code path compiles and
  * is structured for testability (connection factory injected).
  */
object JdbcSink {

  /** `CREATE TABLE IF NOT EXISTS` — U2, `weather_hourly_pipeline.py:92-99`. */
  val ddl: String =
    """CREATE TABLE IF NOT EXISTS public.weather_hourly (
      |  time TIMESTAMP NOT NULL,
      |  temperature_2m DOUBLE PRECISION,
      |  relative_humidity_2m DOUBLE PRECISION,
      |  ingested_at TIMESTAMP
      |)""".stripMargin

  /** Idempotent per-day load: within one transaction, delete the batch day
    * and re-insert all rows (U1). `connect` is injected so tests can pass
    * an embedded database. Column order mirrors the reference's explicit
    * select (`weather_hourly_pipeline.py:104-106`). */
  def upsertDay(df: DataFrame, day: java.sql.Date,
      connect: () => Connection): Unit = {
    val rows = df
      .select("time", "temperature_2m", "relative_humidity_2m", "ingested_at")
      .collect() // reference semantics: one driver-side txn per batch day
    val conn = connect()
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      st.execute(ddl)
      val del = conn.prepareStatement(
        "DELETE FROM public.weather_hourly WHERE CAST(time AS DATE) = ?")
      del.setDate(1, day)
      del.executeUpdate()
      val ins = conn.prepareStatement(
        "INSERT INTO public.weather_hourly (time, temperature_2m, " +
          "relative_humidity_2m, ingested_at) VALUES (?, ?, ?, ?)")
      rows.foreach { r =>
        ins.setTimestamp(1, r.getTimestamp(0))
        if (r.isNullAt(1)) ins.setNull(2, java.sql.Types.DOUBLE)
        else ins.setDouble(2, r.getDouble(1))
        if (r.isNullAt(2)) ins.setNull(3, java.sql.Types.DOUBLE)
        else ins.setDouble(3, r.getDouble(2))
        ins.setTimestamp(4, r.getTimestamp(3))
        ins.addBatch()
      }
      ins.executeBatch()
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally {
      conn.close()
    }
  }

  /** Env-var connection factory, mirroring `pg.py:5-14`. */
  def envConnection(): Connection = {
    val host = sys.env.getOrElse("POSTGRES_HOST", "localhost")
    val port = sys.env.getOrElse("POSTGRES_PORT", "5432")
    val db = sys.env.getOrElse("POSTGRES_DB", "warehouse")
    val user = sys.env.getOrElse("POSTGRES_USER", "postgres")
    val pass = sys.env.getOrElse("POSTGRES_PASSWORD", "")
    DriverManager.getConnection(
      s"jdbc:postgresql://$host:$port/$db", user, pass)
  }
}
