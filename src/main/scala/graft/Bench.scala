package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every contract query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Queries run through the `noop` sink, which evaluates every operator and
  * row fully (a bare .count() would let Catalyst prune the very
  * projections being measured).
  *
  * Measurement hygiene (round-4 lesson: identical code measured 9% slower
  * round-over-round, one query 4x, purely from GC/cleaner noise):
  * - each query gets 1 untimed warm-up rep, then `SPARK_GRAFT_BENCH_REPS`
  *   (default 3) timed reps; the reported number is the MEDIAN;
  * - the full result map is also written to BENCH_FULL.json (the driver's
  *   output capture tails the stdout line and can truncate its head, which
  *   round 4 lost the total and ~20 queries to), and the total is
  *   duplicated at the END of the JSON line so a head-truncated tail still
  *   carries it. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // test tables are single parquet files; the default 128m split size
      // would hand a whole table to 1-2 tasks. 16m keeps every core on a
      // scan at local SFs — the same lever, sized oppositely, that keeps
      // partitions memory-bounded at 100 TB (SURVEY.md §4 spill-aware).
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      // JVM (not ICU) case mapping: identical on ASCII, avoids a ~60s
      // one-time ICU table init the first time upper()/lower() executes.
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorb JVM/codegen/scan init so the first measured
    // query isn't charged for it
    try {
      import org.apache.spark.sql.functions._
      val li = Tables.load(spark, sfDir, "lineitem")
      li.groupBy(col("l_returnflag")).count()
        .join(li.limit(10), Seq("l_returnflag"))
        .orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
      System.gc()
    } catch { case _: Throwable => () }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // Nudge the ContextCleaner: shuffle/broadcast state is only released
      // on GC, and without pressure the JVM defers it — measured ~5-10x
      // degradation of later queries in a 50-query run without this.
      System.gc()
      sec
    }
    // optional comma-separated filter for local iteration on a few queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      runOnce(name, fn) // warm-up: codegen + scan caches, untimed
      val timed = Seq.fill(reps)(runOnce(name, fn)).sorted
      val median = timed(timed.length / 2)
      System.err.println(
        f"[bench] $name median $median%.3fs (reps ${timed.map(t => f"$t%.3f").mkString(",")})")
      name -> median
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // contract-size fields derived from SparkEntry ITSELF, never hand
    // counts (round-7 lesson: hand-maintained totals in the progress notes
    // drifted from the driver's ground truth); n_oracle must equal the
    // pass+fail row count of the driver's CORRECTNESS file exactly
    val nQueries = SparkEntry.queries.size
    val nOracle = SparkEntry.oracleSql.size
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"n_queries":$nQueries,"n_oracle":$nOracle,"total_sec":$total%.3f}"""
    println(line)
    // full copy in the repo: immune to any driver-side stdout truncation.
    // Only for full runs — a SPARK_GRAFT_BENCH_ONLY iteration must not
    // clobber the complete map.
    if (only.isEmpty) {
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
          (line + "\n").getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
