package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× heavy-tail rehearsal data generator (not part of the driver
  * contract): replicates the sf0.1 documents/embeddings tables 10×
  * with per-replica perturbations chosen so the STATISTICAL SHAPE the
  * tail queries depend on scales linearly instead of degenerately:
  *
  *  - documents: replica r > 0 suffixes EVERY THIRD TOKEN with a
  *    replica salt, so texts that were exact/near dups WITHIN a replica
  *    stay dups (the transform is a pure function of (text, r) — group
  *    sizes constant) while every 3-token shingle differs ACROSS
  *    replicas (each shingle spans a salted position), killing
  *    cross-replica LSH collisions. The first cut of this generator
  *    appended one trailing tag instead; long docs then sat at
  *    cross-replica Jaccard ≈0.97, every doc banded with its 9 clones,
  *    and stream_neardup measured ~13× — a quadratic artifact of the
  *    FIXTURE (real 10× corpora don't contain each doc 10× at J≈0.97),
  *    not of the operator. n_chars is recomputed so the text/n_chars
  *    invariant the quality lanes use holds.
  *  - embeddings: replica r > 0 nudges one vec_id-dependent component
  *    by 0.05·r — far enough that no cross-replica pair clears the t6
  *    0.999999 exact-dup threshold (semdedup stays linear), close
  *    enough that cell/label geometry is preserved.
  *
  * Output: /tmp/graft_sf1/{documents,embeddings}.parquet (50k docs /
  * 20k vectors). Usage: runMain graft.tools.ScaleRehearsal, then
  * SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_BENCH_ONLY=<tail>
  * runMain graft.Bench — ratios vs the sf0.1 scoped floors go to
  * BASELINE.md.
  *
  * Round-10 extension (verdict item 8): `SPARK_GRAFT_REHEARSAL_REPLICAS`
  * / `SPARK_GRAFT_REHEARSAL_OUT` / `SPARK_GRAFT_REHEARSAL_TABLES` let a
  * 30× run target only the two axes that drive the superlinear risks
  * the 10× pass caught (documents for LSH banding, embeddings for IVF
  * build) without regenerating the TPC-H tables:
  * `SPARK_GRAFT_REHEARSAL_REPLICAS=30 SPARK_GRAFT_REHEARSAL_OUT=/tmp/graft_sf3
  * SPARK_GRAFT_REHEARSAL_TABLES=documents,embeddings`. */
object ScaleRehearsal {
  val OutDir: String =
    sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_OUT", "/tmp/graft_sf1")
  val Replicas: Int =
    sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_REPLICAS", "10").toInt
  val Tables: Set[String] =
    sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_TABLES",
      "documents,embeddings,lineitem,events").split(",").map(_.trim).toSet
  val IdStride = 10000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"

    if (Tables("documents")) {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until Replicas).map { r =>
      val tagged =
        if (r == 0) docs
        else docs.withColumn("text",
          array_join(transform(split(col("text"), " "),
            (t, i) => when(i % 3 === 2, concat(t, lit(s"zq$r")))
              .otherwise(t)), " "))
      tagged.select(
        (col("doc_id") + lit(r * IdStride)).as("doc_id"),
        col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$OutDir/documents.parquet")
    }

    if (Tables("embeddings")) {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until Replicas).map { r =>
      val nudged =
        if (r == 0) emb
        else emb.withColumn("embedding",
          transform(col("embedding"),
            (x, i) => when(i === pmod(col("vec_id") + lit(r), lit(64)),
              x + lit(0.05f * r)).otherwise(x)))
      nudged.select(
        (col("vec_id") + lit(r * IdStride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$OutDir/embeddings.parquet")
    }

    if (Tables("lineitem")) {
    // lineitem: 10x rows with the l_orderkey domain offset per replica
    // and the (l_partkey, l_suppkey) domains UNCHANGED — the realistic
    // growth shape (more line items per part/supplier), and exactly
    // what the layout gates need: zorder_skip_gate's bucket geometry
    // is a function of the key DOMAINS, bloom_skip_gate's per-chunk
    // ndv grows to ~92k, still under the 200k the filter is sized for.
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until Replicas).map { r =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r * IdStride))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$OutDir/lineitem.parquet")
    }

    if (Tables("events")) {
    // events: 10x rows inside the SAME calendar span (more events per
    // day — the growth shape mart_incremental's O(day) claim is about;
    // day count constant, delta-day row count 10x). Tables.load
    // normalizes the ns annotation; the rewrite lands as plain µs.
    val ev = graft.Tables.load(spark, src, "events")
    (0 until Replicas).map { r =>
      ev.withColumn("event_id", col("event_id") + lit(r * IdStride))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$OutDir/events.parquet")
    }

    val counts = Tables.toSeq.sorted.map { t =>
      s"$t=${spark.read.parquet(s"$OutDir/$t.parquet").count()}"
    }
    println(s"[rehearsal] wrote $OutDir x$Replicas ${counts.mkString(" ")}")
  }
}
