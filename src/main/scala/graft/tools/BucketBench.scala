package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Relational.dsum
import graft.store.Bucketing

/** One-off measurement: `segment_revenue` as a plain shuffle join vs the
  * same aggregate over write-time-bucketed orders/customer
  * (`Bucketing.writeBucketed`). Run at sf0.1; numbers recorded in
  * README.md. Not part of the driver bench (it writes catalog tables). */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_wh_").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def segRevenue(joined: org.apache.spark.sql.DataFrame) =
      joined
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy("c_mktsegment")

    def time(name: String, reps: Int)(f: => Unit): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[bucketbench] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3fs")
        System.gc()
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val orders = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")

    // one-time write cost (the price bucketing pays once)
    time("write_bucketed", 1) {
      Bucketing.writeBucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), "orders_b",
        "custkey", 16)
      Bucketing.writeBucketed(
        customer.withColumnRenamed("c_custkey", "custkey"), "customer_b",
        "custkey", 16)
    }

    // warmup both paths once, then measure
    noop(segRevenue(orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))))
    noop(segRevenue(Bucketing.coLocatedJoin(spark, "orders_b", "customer_b",
      "custkey")))
    System.gc()

    // auto-broadcast ON: what AQE picks at this SF (dim-sized customer)
    time("plain_join_autobroadcast", 5) {
      noop(segRevenue(orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))))
    }
    // broadcast OFF: the fact-to-fact regime (at 100 TB neither side
    // broadcasts) — this is the case bucketing exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      time("plain_shuffle_join", 5) {
        noop(segRevenue(orders.join(customer,
          orders("o_custkey") === customer("c_custkey"))))
      }
      time("bucketed_join", 5) {
        noop(segRevenue(Bucketing.coLocatedJoin(spark, "orders_b",
          "customer_b", "custkey")))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.stop()
  }
}
