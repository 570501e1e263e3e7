package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, RelationalExt, RelationalMore}

/** Cross-operator consistency checks (the value-level gate is the DuckDB
  * oracle; these pin relationships between operators). */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("semi + anti partition the customer table on the same order slice") {
    import org.apache.spark.sql.functions._
    // joinAnti filters orders to < 1996 (so it is non-vacuous at every
    // SF); the partition invariant must use the same slice on both sides.
    val semi = Tables.load(spark, TestSpark.sf, "customer")
      .join(
        Tables.load(spark, TestSpark.sf, "orders")
          .filter(col("o_orderdate") < lit("1996-01-01")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    val anti = RelationalExt.joinAnti(spark, TestSpark.sf).count()
    val all = Tables.load(spark, TestSpark.sf, "customer").count()
    assert(semi + anti === all)
    assert(anti > 0 && semi > 0) // both sides non-empty: the gate is real
  }

  test("incremental mart materialization is bit-identical to the " +
      "one-shot mart") {
    val full = Relational.martDaily(spark, TestSpark.sf).collect().toSeq
    val inc = Relational.martIncremental(spark, TestSpark.sf)
      .collect().toSeq
    assert(inc === full,
      "history build + one-day delta merge must reproduce the full " +
        "recompute exactly")
    assert(full.size >= 2, "fixture must span >1 day or the delta " +
      "merge path is vacuous")
  }

  test("set algebra: |union| = |A| + |B| - |intersect|") {
    val c = Tables.load(spark, TestSpark.sf, "customer")
      .select("c_nationkey").distinct().count()
    val s = Tables.load(spark, TestSpark.sf, "supplier")
      .select("s_nationkey").distinct().count()
    val u = RelationalExt.setUnion(spark, TestSpark.sf).count()
    val i = RelationalExt.setIntersect(spark, TestSpark.sf).count()
    assert(u === c + s - i)
  }

  test("rollup grand total equals table count") {
    val r = RelationalExt.rollupEvents(spark, TestSpark.sf).collect()
    val total = r.find(_.isNullAt(0)).get.getLong(1)
    assert(total === Tables.load(spark, TestSpark.sf, "events").count())
  }

  test("exact-decimal sum is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val a = li.agg(Relational.dsum(col("l_extendedprice"))).head().getDouble(0)
    val b = li.repartition(13).agg(Relational.dsum(col("l_extendedprice")))
      .head().getDouble(0)
    assert(a === b)
  }

  test("q1 plan: partial aggregation before the exchange") {
    val plan = Relational.q1Pricing(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("Exchange"))
  }

  test("funnel: step counts shrink monotonically and start at the view users") {
    import org.apache.spark.sql.functions._
    val steps = RelationalMore.funnelSteps(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(steps("step1_view") >= steps("step2_click"))
    assert(steps("step2_click") >= steps("step3_purchase"))
    val viewers = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(steps("step1_view") === viewers)
  }

  test("outliers: every flagged row clears the threshold; flags are stable " +
      "under repartitioning") {
    import org.apache.spark.sql.functions._
    val rows = RelationalMore.valueOutliers(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getDouble(3)) > 2.999999 - 1e-9))
    // decimal-moment means/stds are partitioning-invariant, so the
    // flagged id set must be identical on a different layout
    val ids = rows.map(_.getLong(0)).toSet
    val again = RelationalMore.valueOutliers(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    assert(again === ids)
  }

  test("retention: offset-0 row equals the cohort size; users conserved") {
    import org.apache.spark.sql.functions._
    val rows = RelationalMore.retentionCohorts(spark, TestSpark.sf).collect()
    val byCohort = rows.groupBy(_.getDate(0))
    // day-0 retention is definitionally every user of the cohort, and no
    // later offset can exceed it
    byCohort.foreach { case (c, rs) =>
      val d0 = rs.find(_.getLong(1) == 0L).map(_.getLong(2))
      assert(d0.nonEmpty, s"cohort $c missing its day-0 row")
      assert(rs.forall(_.getLong(2) <= d0.get))
    }
    // each user is in exactly one cohort: day-0 counts sum to all users
    val allUsers = Tables.load(spark, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    val d0sum = byCohort.values
      .map(_.find(_.getLong(1) == 0L).get.getLong(2)).sum
    assert(d0sum === allUsers)
  }

  test("scd2: versions are dense change-collapsed runs, intervals tile " +
      "each user's timeline, exactly one open version per user") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.RelationalMore
      .scd2History(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    // independent recount of change runs from the raw log
    val events = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    byUser.foreach { case (user, vs) =>
      val ordered = vs.sortBy(_.getInt(1))
      // versions dense from 1
      assert(ordered.map(_.getInt(1)).toSeq === (1 to ordered.length))
      // consecutive versions always change the attribute (collapse held)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(2) != b.getString(2))
        case _ =>
      }
      // intervals tile: valid_to(v) == valid_from(v+1); only last open
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(5) === b.getTimestamp(3))
        case _ =>
      }
      assert(ordered.dropRight(1).forall(!_.getBoolean(6)))
      assert(ordered.last.getBoolean(6) && ordered.last.get(5) == null)
      // run count equals the independent recount, events conserved
      // order by full µs precision (getTime alone is ms-truncated)
      val log = events(user)
        .sortBy(t => (t._2.getTime / 1000, t._2.getNanos, t._3))
      val runs = log.map(_._4).foldLeft(List.empty[String]) {
        case (acc, t) if acc.headOption.contains(t) => acc
        case (acc, t) => t :: acc
      }.length
      assert(ordered.length === runs)
      assert(ordered.map(_.getLong(4)).sum === log.length.toLong)
    }
  }
}
