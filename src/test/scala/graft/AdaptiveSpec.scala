package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Tuning

/** Runtime re-planning at scale, provoked at test scale: AQE skew-join
  * split and runtime bloom-filter join pruning. Thresholds are shrunk so
  * KB-scale data crosses them; the plan markers asserted here are the
  * same ones a 100 TB job shows. */
class AdaptiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("retry parity: airflow retries:1 maps to 2 Spark task attempts") {
    assert(Tuning.retryConfs(1) === Map("spark.task.maxFailures" -> "2"))
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    import org.apache.spark.sql.functions._
    val s = spark.newSession()
    val prev = Tuning(s, Tuning.skewJoinConfs(
      skewedPartitionFactor = 2,
      thresholdBytes = "16KB",
      advisoryBytes = "8KB") ++ Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8"))
    try {
      import s.implicits._
      // key 0 holds ~98% of the left side -> its shuffle partition dwarfs
      // the median and must be split by OptimizeSkewedJoin. The payload
      // must SURVIVE into the aggregate (max(payload)) or column pruning
      // shrinks the shuffled rows to one constant long, which compresses
      // below any realistic skew threshold (measured: no split fired).
      val left = s.range(300000)
        .select(when(col("id") % 50 === 0, col("id") % 7).otherwise(lit(0L))
          .as("k"), sha2(concat(lit("pad-"), col("id")), 256).as("payload"))
      val right = s.range(7).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = left.join(right, Seq("k"))
        .groupBy("name").agg(max(col("payload")).as("p"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SMJ in:\n${plan.take(4000)}")
    } finally Tuning.restore(s, prev)
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    import org.apache.spark.sql.functions._
    val s = spark.newSession()
    val prev = Tuning(s, Tuning.bloomJoinConfs(
      creationSideThreshold = "10m",
      applicationSideThreshold = "1KB") ++ Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))
    try {
      val orders = Tables.load(s, TestSpark.sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.load(s, TestSpark.sf, "lineitem")
      val joined = li.join(orders,
        li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter"),
        s"expected an injected bloom filter in:\n${optimized.take(4000)}")
    } finally Tuning.restore(s, prev)
  }
}
