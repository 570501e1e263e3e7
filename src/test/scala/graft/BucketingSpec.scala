package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.Bucketing

/** Bucketed tables must join without shuffling either side — the
  * write-time co-location contract. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withSmjForced(f: => Unit): Unit = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucketing equi-join plans with no Exchange on either side") {
    // fresh location each run: the in-memory catalog forgets tables between
    // JVMs but their directories persist, and saveAsTable refuses to reuse
    val loc = java.nio.file.Files.createTempDirectory("graft_bkt_wh_")
    spark.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    spark.sql(s"CREATE DATABASE graft_bkt LOCATION '$loc'")
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.load(spark, TestSpark.sf, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
      .withColumnRenamed("c_custkey", "o_custkey")
    Bucketing.writeBucketed(orders, "graft_bkt.orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "graft_bkt.customer_b", "o_custkey", 8)
    withSmjForced {
      val joined = Bucketing.coLocatedJoin(
        spark, "graft_bkt.orders_b", "graft_bkt.customer_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(2000))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" +
        plan.take(2000))
      // and the result is the plain join's result
      val expect = orders.join(customer, "o_custkey").count()
      assert(joined.count() === expect)
    }
  }

  test("group-by on the bucket key needs no exchange either") {
    withSmjForced {
      val agg = spark.table("graft_bkt.orders_b")
        .groupBy("o_custkey")
        .count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucket distribution should satisfy the group-by:\n" + plan.take(2000))
      assert(agg.count() > 0)
    }
  }
}
