package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off experiment: attribute the ~2 s cost of a 128-dir
  * partitionBy write (the writeLshIndex postings shape) to committer
  * renames vs writer-task count. Not on any query path. */
object WriteExp {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val emb = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val postings = emb.select(col("vec_id"),
      posexplode(graft.functions.SketchExpressions.hyperplaneBands(
        col("embedding"), 4, 8)).as(Seq("band", "bucket")))
    val root = java.nio.file.Files.createTempDirectory("graft-wexp-")
    def run(tag: String)(body: String => Unit): Unit = {
      // warm + 3 reps
      (0 to 3).foreach { i =>
        val out = s"$root/$tag-$i"
        val t0 = System.nanoTime()
        body(out)
        val sec = (System.nanoTime() - t0) / 1e9
        if (i > 0) println(f"[wexp] $tag rep$i $sec%.3fs")
        System.gc()
      }
    }
    run("noaqe") { out =>
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try postings.repartition(col("band"), col("bucket"))
        .write.mode("overwrite").partitionBy("band", "bucket")
        .option("compression", "zstd").parquet(out)
      finally s.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    run("baseline") { out =>
      postings.repartition(col("band"), col("bucket"))
        .write.mode("overwrite").partitionBy("band", "bucket")
        .option("compression", "zstd").parquet(out)
    }
    run("v2committer") { out =>
      postings.repartition(col("band"), col("bucket"))
        .write.mode("overwrite").partitionBy("band", "bucket")
        .option("compression", "zstd")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(out)
    }
    run("nosummary") { out =>
      postings.repartition(col("band"), col("bucket"))
        .write.mode("overwrite").partitionBy("band", "bucket")
        .option("compression", "zstd")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(out)
    }
    run("t32") { out =>
      postings.repartition(32, col("band"), col("bucket"))
        .write.mode("overwrite").partitionBy("band", "bucket")
        .option("compression", "zstd").parquet(out)
    }
    run("t32v2") { out =>
      postings.repartition(32, col("band"), col("bucket"))
        .write.mode("overwrite").partitionBy("band", "bucket")
        .option("compression", "zstd")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(out)
    }
    run("snappy32v2") { out =>
      postings.repartition(32, col("band"), col("bucket"))
        .write.mode("overwrite").partitionBy("band", "bucket")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(out)
    }
    // count files to confirm layout identical
    def count(dir: String): Int = {
      val d = new java.io.File(dir)
      if (!d.exists) 0
      else d.listFiles.map(f =>
        if (f.isDirectory) count(f.getPath) else 1).sum
    }
    Seq("baseline", "t32v2").foreach(t =>
      println(s"[wexp] files $t = ${count(s"$root/$t-1")}"))
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    s.stop()
  }
}
