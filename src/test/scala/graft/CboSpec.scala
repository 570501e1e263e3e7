package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer story — the statistics discipline the q9-style
  * join trees depend on at 100×: a freshly filtered dimension has no
  * useful size estimate from file bytes alone (a Filter passes its
  * child's size through the size-only visitor), so the planner keeps
  * the shuffle join it would pick for the FULL table. `ANALYZE TABLE
  * ... COMPUTE STATISTICS [FOR COLUMNS ...]` gives the CBO row counts
  * and per-column NDVs; FilterEstimation then shrinks the filtered
  * side below the broadcast threshold and the SAME query plans a
  * broadcast join instead. This spec pins the whole causal chain on a
  * TPC-H q3-shaped query: estimate shrinks ⇒ join strategy flips ⇒
  * flip is attributable to CBO (cbo.enabled=false with identical
  * catalog stats keeps the shuffle join).
  *
  * AQE stays off for the planning assertions: runtime size re-planning
  * would mask the compile-time decision under test (and at real scale
  * the compile-time decision is what schedules the first stage). */
class CboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE stats shrink the filtered-dimension estimate and " +
      "flip the q3-shaped join from shuffle to broadcast; without CBO " +
      "the same stats flip nothing") {
    spark.sql("DROP TABLE IF EXISTS cbo_customer")
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("CREATE TABLE cbo_customer USING parquet LOCATION " +
      s"'${TestSpark.sf}/customer.parquet'")
    spark.sql("CREATE TABLE cbo_orders USING parquet LOCATION " +
      s"'${TestSpark.sf}/orders.parquet'")
    try {
      // the estimate on the exact (column-pruned) shape the join's
      // build side has — the size-only visitor scales by projected
      // width, so an unpruned probe would misplace the threshold
      def filteredEst: BigInt = spark.table("cbo_customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .queryExecution.optimizedPlan.stats.sizeInBytes
      def joinPlan: String = spark.table("cbo_orders")
        .join(spark.table("cbo_customer")
          .filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .queryExecution.sparkPlan.toString

      val before = withConf("spark.sql.cbo.enabled" -> "true")(filteredEst)
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS " +
        "FOR COLUMNS c_mktsegment, c_custkey")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
      val after = withConf("spark.sql.cbo.enabled" -> "true")(filteredEst)
      // column stats let FilterEstimation apply the segment's 1/ndv
      // selectivity instead of passing the whole table size through
      assert(after < before,
        s"stats did not shrink the filtered estimate: $after vs $before")

      val threshold = ((after + before) / 2).toString
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> threshold) {
        val withCbo = withConf("spark.sql.cbo.enabled" -> "true")(joinPlan)
        assert(withCbo.contains("BroadcastHashJoin"),
          s"CBO + stats must broadcast the filtered dim:\n" +
            withCbo.take(1200))
        val noCbo = withConf("spark.sql.cbo.enabled" -> "false")(joinPlan)
        assert(noCbo.contains("SortMergeJoin") &&
          !noCbo.contains("BroadcastHashJoin"),
          s"size-only estimation must keep the shuffle join:\n" +
            noCbo.take(1200))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_customer")
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
    }
  }

  test("CBO join reorder: with stats the fact-fact-dim chain joins the " +
      "filtered dimension into orders FIRST; without CBO the written " +
      "order stands") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    Seq("customer", "orders", "lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS cbo2_$t")
      spark.sql(s"CREATE TABLE cbo2_$t USING parquet LOCATION " +
        s"'${TestSpark.sf}/$t.parquet'")
      spark.sql(s"ANALYZE TABLE cbo2_$t COMPUTE STATISTICS")
    }
    spark.sql("ANALYZE TABLE cbo2_customer COMPUTE STATISTICS " +
      "FOR COLUMNS c_mktsegment, c_custkey")
    spark.sql("ANALYZE TABLE cbo2_orders COMPUTE STATISTICS " +
      "FOR COLUMNS o_custkey, o_orderkey")
    spark.sql("ANALYZE TABLE cbo2_lineitem COMPUTE STATISTICS " +
      "FOR COLUMNS l_orderkey")
    try {
      // written order: (lineitem ⋈ orders) ⋈ filtered customer — the
      // worst order, building the biggest intermediate first
      def innermostJoinLeaves: String = {
        val df = spark.table("cbo2_lineitem")
          .join(spark.table("cbo2_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(spark.table("cbo2_customer")
            .filter(col("c_mktsegment") === "BUILDING"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        val joins = df.queryExecution.optimizedPlan.collect {
          case j: Join => j
        }
        assert(joins.nonEmpty)
        joins.last.collectLeaves().map(_.toString).mkString("\n")
      }
      val reordered = withConf(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true")(innermostJoinLeaves)
      // cost-based DP reorder pairs orders with the 1/ndv-shrunk
      // customer side first, so lineitem joins a pre-filtered stream
      assert(reordered.contains("cbo2_customer") &&
        !reordered.contains("cbo2_lineitem"),
        s"expected orders⋈customer innermost with CBO reorder:\n" +
          reordered.take(600))
      val written = withConf(
        "spark.sql.cbo.enabled" -> "false")(innermostJoinLeaves)
      assert(written.contains("cbo2_lineitem"),
        s"expected the written lineitem⋈orders order without CBO:\n" +
          written.take(600))
    } finally Seq("customer", "orders", "lineitem").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS cbo2_$t"))
  }
}
