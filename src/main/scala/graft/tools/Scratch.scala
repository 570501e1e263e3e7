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
      // JVM (not ICU) case mapping: identical on ASCII, avoids a ~60s
      // one-time ICU table init the first time upper()/lower() executes.
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val o = graft.Tables.load(spark, dir, "orders")
    time("count")(o.count())
    time("year_only")(o.select(col("o_orderkey"),
      year(col("o_orderdate")).as("yr")).orderBy("o_orderkey").count())
    time("month_day")(o.select(month(col("o_orderdate")),
      dayofmonth(col("o_orderdate"))).count())
    time("strings")(o.select(upper(col("o_orderpriority")),
      substring(col("o_orderstatus"), 1, 1),
      length(col("o_orderpriority")),
      concat(col("o_orderstatus"), lit("|"), col("o_orderpriority"))).count())
    time("full_scalar")(graft.operators.RelationalExt.scalarFuncs(spark, dir).count())
    time("full_scalar_again")(graft.operators.RelationalExt.scalarFuncs(spark, dir).count())
    time("write_scalar")(graft.operators.RelationalExt.scalarFuncs(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_out"))
    time("write_no_concat")(o.select(col("o_orderkey"),
      year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dom"))
      .orderBy("o_orderkey")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_out2"))
    time("write_strings_only")(o.select(col("o_orderkey"),
      upper(col("o_orderpriority")).as("u"),
      substring(col("o_orderstatus"), 1, 1).as("s1"),
      length(col("o_orderpriority")).as("l"),
      concat(col("o_orderstatus"), lit("|"), col("o_orderpriority")).as("t"))
      .orderBy("o_orderkey")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_out3"))
    spark.stop()
  }
}
