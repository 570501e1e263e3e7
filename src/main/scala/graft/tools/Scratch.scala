package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val out = graft.streaming.HourlyStream.runAttributionOuterOnce(spark, dir)
      .cache()
    val matched = out.filter(col("click_id").isNotNull).count()
    val nulls = out.filter(col("click_id").isNull).cache()
    println(s"[scratch] outer: matched=$matched nulls=${nulls.count()}")
    // boundary: max purchase ts among emitted null rows, vs corpus max ts
    val ev = graft.Tables.load(spark, dir, "events")
    ev.createOrReplaceTempView("ev")
    val maxTs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val nullIds = nulls.select("purchase_id")
    val nullTs = ev.join(nullIds, ev("event_id") === nullIds("purchase_id"))
      .agg(max(unix_micros(col("ts"))), min(unix_micros(col("ts"))))
      .head()
    println(s"[scratch] maxTs=$maxTs nullRowsMaxTs=${nullTs.getLong(0)} " +
      s"delta=${(maxTs - nullTs.getLong(0)) / 1000000.0}s")
    // per-side watermarks: each stream filters its event_type BEFORE
    // withWatermark, so global wm = min(side maxes) - 1d
    val maxClick = ev.filter(col("event_type") === "click")
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val maxPurch = ev.filter(col("event_type") === "purchase")
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmUs = math.min(maxClick, maxPurch) - 86400000000L
    val wmMsUs = (math.min(maxClick, maxPurch) / 1000L - 86400000L) * 1000L
    println(s"[scratch] maxClick=$maxClick maxPurch=$maxPurch")
    for ((bound, tag) <- Seq((wmUs, "wm_us"), (wmMsUs, "wm_ms_floor"))) {
      for (op <- Seq("<", "<=")) {
        val n = spark.sql(
          s"""SELECT count(*) FROM ev p
             | WHERE p.event_type = 'purchase'
             | AND NOT EXISTS (SELECT 1 FROM ev c WHERE c.event_type = 'click'
             |   AND c.user_id = p.user_id
             |   AND c.ts >= p.ts - INTERVAL 30 MINUTES AND c.ts <= p.ts)
             | AND unix_micros(p.ts) $op $bound""".stripMargin)
          .head().getLong(0)
        println(s"[scratch] unmatched $tag $op: $n")
      }
    }
    spark.stop()
  }
}
