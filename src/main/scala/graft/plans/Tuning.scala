package graft.plans

import org.apache.spark.sql.SparkSession

/** Deployment tuning blocks: the reference's orchestration-level
  * resilience/skew decisions rendered as Spark conf sets, applied
  * explicitly instead of hidden in a runbook.
  */
object Tuning {

  /** Task-retry parity with the reference's Airflow retry policy
    * (`retries: 1` with `retry_delay`,
    * /root/reference/airflow/dags/weather_hourly_pipeline.py:14-15):
    * an Airflow task re-run maps to a Spark TASK re-attempt, so
    * `retries: 1` = 2 total attempts = `spark.task.maxFailures 2`.
    * Spark has no per-task retry delay (scheduler re-queues
    * immediately); the closest analog for transient-source backoff is
    * retry inside the source itself (WeatherIngest's fetch raises and
    * lets the task attempt retry). */
  def retryConfs(airflowRetries: Int = 1): Map[String, String] = Map(
    "spark.task.maxFailures" -> (airflowRetries + 1).toString)

  /** AQE skew handling: let runtime stats split oversized shuffle
    * partitions of a sort-merge join (the no-code-change answer to key
    * skew; `Sketches.saltedJoin` is the explicit-salt fallback for
    * aggregations, where AQE cannot split a group). Thresholds here are
    * CLUSTER-scale defaults: a partition 4x the median and over 256 MB
    * splits. Tests shrink the thresholds to provoke the path on KB-scale
    * data (`AdaptiveSpec`). */
  def skewJoinConfs(
      skewedPartitionFactor: Int = 4,
      thresholdBytes: String = "256m",
      advisoryBytes: String = "64m"): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
      skewedPartitionFactor.toString,
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
      thresholdBytes,
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisoryBytes)

  /** Runtime bloom-filter join pruning: when one join side is small and
    * selectively filtered, Spark injects a bloom filter built from it
    * into the OTHER side's scan, dropping non-joining rows before the
    * shuffle — at 100 TB this is the difference between shuffling the
    * full probe side and shuffling only rows that can match. On by
    * default in Spark 4; the thresholds are exposed because test-scale
    * data sits under the defaults. */
  def bloomJoinConfs(
      creationSideThreshold: String = "10m",
      applicationSideThreshold: String = "10g"): Map[String, String] = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
      creationSideThreshold,
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
      applicationSideThreshold)

  /** Apply a conf block to a session (returns the previous values so
    * callers can restore). */
  def apply(s: SparkSession, confs: Map[String, String]): Map[String, Option[String]] = {
    val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    prev
  }

  def restore(s: SparkSession, prev: Map[String, Option[String]]): Unit =
    prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
}
