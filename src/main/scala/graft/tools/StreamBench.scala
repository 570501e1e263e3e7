package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.HourlyStream

/** One-off measurement for the streaming trio (16% of the round-2 bench):
  * micro-batch fixed costs under candidate configs. Not a contract main. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[streambench] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      System.gc()
    }
    def withConf(k: String, v: String)(body: => Unit): Unit = {
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try body finally prev match {
        case Some(p) => spark.conf.set(k, p)
        case None => spark.conf.unset(k)
      }
    }

    // warmup pass
    noop(HourlyStream.runDedupOnce(spark, sfDir))
    System.gc()

    for (rep <- 1 to 2) {
      time(s"baseline_daily_r$rep") { noop(HourlyStream.runDailyAggOnce(spark, sfDir)) }
      time(s"baseline_dedup_r$rep") { noop(HourlyStream.runDedupOnce(spark, sfDir)) }
      time(s"baseline_sessions_r$rep") { noop(HourlyStream.runSessionsOnce(spark, sfDir)) }

      // no-data micro-batch skipped: result-neutral for update-mode agg and
      // append dedup (their trailing batch emits nothing; only state
      // eviction is deferred). Sessions NEED it (EventTimeTimeout fires
      // there), so it stays on for them.
      withConf("spark.sql.streaming.noDataMicroBatches.enabled", "false") {
        time(s"nodata_off_daily_r$rep") { noop(HourlyStream.runDailyAggOnce(spark, sfDir)) }
        time(s"nodata_off_dedup_r$rep") { noop(HourlyStream.runDedupOnce(spark, sfDir)) }
      }

      // fewer state partitions: state-store commit overhead is per
      // partition per batch (defaults are 4 everywhere as of round 5 —
      // the 8-partition variants here keep the A/B honest)
      time(s"parts4_daily_r$rep") { noop(HourlyStream.runDailyAggOnce(spark, sfDir, statePartitions = 4)) }
      time(s"parts8_dedup_r$rep") { noop(HourlyStream.runDedupOnce(spark, sfDir, statePartitions = 8)) }
      time(s"parts16_dedup_r$rep") { noop(HourlyStream.runDedupOnce(spark, sfDir, statePartitions = 16)) }
      time(s"parts8_sessions_r$rep") { noop(HourlyStream.runSessionsOnce(spark, sfDir, statePartitions = 8)) }
      time(s"parts8_ucounts_r$rep") { noop(HourlyStream.runningUserCounts(spark, sfDir, statePartitions = 8)) }
      time(s"parts4_ucounts_r$rep") { noop(HourlyStream.runningUserCounts(spark, sfDir)) }

      // RocksDB state store: JNI + disk vs in-memory HDFS-backed maps
      withConf("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
        time(s"rocksdb_dedup_r$rep") { noop(HourlyStream.runDedupOnce(spark, sfDir)) }
        time(s"rocksdb_daily_r$rep") { noop(HourlyStream.runDailyAggOnce(spark, sfDir)) }
      }
    }
    spark.stop()
  }
}
