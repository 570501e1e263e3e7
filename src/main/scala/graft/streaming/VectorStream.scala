package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType,
  StructField, StructType}

import graft.functions.Num
import graft.operators.Dedup

/** Streaming vector search: query embeddings ARRIVE as files (the
  * online face of the similarity surface — a retrieval service's query
  * log, an embedding job's output drops) and each micro-batch probes
  * the static corpus.
  *
  * Scale shape: the probe batch is the SMALL side by construction —
  * it broadcasts, the corpus is scanned once per micro-batch, and the
  * per-query argmax is a partial+final aggregate keyed on q_id (q rows
  * of struct state per task — never a corpus-sized window, never
  * stream-side state). The aggregation forces `foreachBatch` (the
  * runNearDupOnce discipline: groupBy as a raw stream would be
  * stateful; the micro-batch boundary makes it stateless batch work).
  * In production the corpus side is the hive `cell=`-partitioned IVF
  * index and the scan prunes to each query's probe cells — the batch
  * argmax below is the exact-baseline rendering of the same contract.
  * Results land through batchId-keyed dynamic partition overwrite
  * ([[CorpusStream.upsertSurvivors]]'s exactly-once discipline). */
object VectorStream {

  /** The probe-batch schema as the file stream declares it
    * (schema-first: a streaming source never infers). */
  val probeBatchSchema: StructType = StructType(Seq(
    StructField("q_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = true))))

  /** Streaming source over a directory of parquet probe drops. */
  def readProbes(s: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    s.readStream
      .schema(probeBatchSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Exact top-1 of every probe in one corpus pass: broadcast the probe
    * batch, per-query argmax as min(struct(-cos, vec_id)) — the
    * kmeans/argmaxOver tie discipline (raw-cosine compare, smaller
    * vec_id wins bit-equal ties). */
  def annTop1(batch: DataFrame, corpus: DataFrame): DataFrame = {
    val probes = batch.select(col("q_id"), col("embedding").as("q_emb"))
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(probes))
      .select(col("q_id"), col("vec_id"),
        graft.functions.SketchExpressions
          .cosineSim(col("embedding"), col("q_emb")).as("cos"))
      .groupBy(col("q_id"))
      .agg(min(struct((-col("cos")).as("neg"), col("vec_id"))).as("best"))
      .select(col("q_id"), col("best.vec_id").as("vec_id"),
        (Num.t6(-col("best.neg")) >= 0.999999).as("is_exact"))
  }

  /** Synchronous run-once harness: the five lowest-vec_id embeddings
    * are staged as a probe drop under plant-offset q_ids, streamed with
    * AvailableNow, and each micro-batch's top-1 results upsert into a
    * batchId-keyed warehouse. Each probe is an EXACT copy of its
    * stored original, so rank-1 retrieval of that original with
    * is_exact = TRUE is closed-form (the ann_*_planted precondition:
    * no natural pair reaches t6-cosine 0.999999). */
  def runAnnProbeOnce(s: SparkSession, srcDir: String,
      n: Int = 5): DataFrame = {
    val corpus = graft.Tables.load(s, srcDir, "embeddings")
    val probeDir = HourlyStream.scratchDir("graft_probe_drop_")
    corpus.filter(col("vec_id") < n)
      .select((col("vec_id") + Dedup.PlantOffset).as("q_id"),
        col("embedding"))
      .write.mode("overwrite").parquet(probeDir)
    val whRoot = HourlyStream.scratchDir("graft_ann_wh_")
    val warehouse = whRoot + "/top1"
    val ckpt = HourlyStream.scratchDir("graft_ckpt_")
    val q = readProbes(s, probeDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        CorpusStream.upsertSurvivors(annTop1(b, corpus), warehouse, batchId)
      }
      .start()
    try q.awaitTermination() finally q.stop()
    // n-row result: materialize, then reap the scratch dirs eagerly
    val out = s.read.parquet(warehouse)
      .select(col("q_id"), col("vec_id"), col("is_exact"))
      .orderBy("q_id")
      .localCheckpoint(true)
    Seq(probeDir, whRoot, ckpt).foreach(HourlyStream.reapScratch)
    out
  }
}
