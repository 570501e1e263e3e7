package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Approximate sketches vs exact answers; salted join vs plain join. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx distinct within rsd tolerance of exact; quantiles ordered") {
    val approx = Sketches.approxStats(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.load(spark, TestSpark.sf, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, r) =>
      val a = r.getLong(2).toDouble
      val e = exact(k).toDouble
      assert(math.abs(a - e) / e <= 0.1, s"$k approx=$a exact=$e")
      assert(r.getDouble(3) <= r.getDouble(4), s"$k p50 <= p95")
    }
  }

  test("salted join equals the plain join (aggregated)") {
    import spark.implicits._
    val dim = Seq(("click", 1), ("error", 2), ("purchase", 3),
      ("signup", 4), ("view", 5)).toDF("event_type", "type_code")
    val plain = Tables.load(spark, TestSpark.sf, "events")
      .join(dim, Seq("event_type"))
      .groupBy("type_code").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Sketches.saltedJoinDemo(spark, TestSpark.sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("count-min: estimates dominate exact counts within the eps envelope") {
    val gate = Sketches.cmsHeavyHittersGate(spark, TestSpark.sf).collect()
    assert(gate.length === 25)
    assert(gate.forall(r => r.getAs[Boolean]("dominates")))
    assert(gate.forall(r => r.getAs[Boolean]("within_eps")))
  }

  test("count-min: sketch state is bounded by d*w and merges by summation") {
    import spark.implicits._
    val grams = (1 to 500).map(i => s"g${i % 37}").toDF("gram")
    val whole = Sketches.cmsTable(grams, w = 64, d = 4)
    assert(whole.count() <= 4L * 64)
    // mergeability: sketch(all) == merge(sketch(first half), sketch(rest))
    val h1 = Sketches.cmsTable((1 to 250).map(i => s"g${i % 37}").toDF("gram"),
      w = 64, d = 4)
    val h2 = Sketches.cmsTable((251 to 500).map(i => s"g${i % 37}").toDF("gram"),
      w = 64, d = 4)
    val merged = h1.unionByName(h2)
      .groupBy("seed", "bucket").agg(sum("cnt").as("cnt"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }
}
