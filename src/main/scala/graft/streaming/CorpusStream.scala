package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** Streaming corpus ingestion: the arrival face of the curation surface.
  * A crawl batch LANDS as files; the stream dedups each arriving file
  * against the existing corpus's digest index before it ever reaches the
  * training set — [[graft.operators.Dedup.incrementalDedup]]'s exact
  * lane as a continuously-running filter.
  *
  * Scale shape: the dedup is a stream-static LEFT ANTI join — the stream
  * side carries (doc_id, 16-byte digest) only, the static index side is
  * a digest relation re-planned into every micro-batch (so a warehouse
  * refresh of the index is picked up on the next batch without
  * restarting the stream). Stream-static anti joins are STATELESS: no
  * watermark, no state store, nothing grows with corpus size on the
  * streaming side. At 100 TB the index digest table lives
  * hive-partitioned in the warehouse and the anti join's build side
  * prunes to the digest column — the stream never touches index text. */
object CorpusStream {

  /** The documents schema as the file stream declares it (schema-first:
    * a streaming source never infers). */
  val documentsBatchSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Streaming source over a directory of parquet document drops. */
  def readDocuments(s: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    s.readStream
      .schema(documentsBatchSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** The stream-static anti-join filter itself: arriving documents
    * survive iff their content digest is absent from the index. */
  def indexFiltered(docs: DataFrame, indexDigests: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(indexDigests, Seq("h"), "left_anti")
      .select(col("doc_id"))

  /** Synchronous run-once harness over the bundled corpus, mirroring
    * [[graft.operators.Dedup.incrementalDedup]]'s split exactly: the
    * batch slice (doc_id % 10 == 3, plus the five planted index copies)
    * is staged as a parquet drop directory, streamed with AvailableNow,
    * and anti-joined against the index digest relation. Returns the
    * surviving doc_ids — by construction the exact-lane keep set of the
    * batch operator, which is what the oracle states closed-form. */
  def runIndexDedupOnce(s: SparkSession, srcDir: String): DataFrame = {
    val docs = graft.Tables.load(s, srcDir, "documents")
    val isBatch = col("doc_id") % 10 === 3
    val index = docs.filter(!isBatch).select(col("doc_id"), col("text"))
    val batchDir = HourlyStream.scratchDir("graft_batch_drop_")
    docs.filter(isBatch).select(col("doc_id"), col("text"))
      .unionByName(index
        .filter(col("doc_id") % 100 === 0 && col("doc_id") < 500)
        .select((col("doc_id") + Dedup.PlantOffset).as("doc_id"),
          col("text")))
      .write.mode("overwrite").parquet(batchDir)
    val indexDigests = index.select(md5(col("text")).as("h")).distinct()
    val name = "graft_stream_index_dedup_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val q = indexFiltered(readDocuments(s, batchDir), indexDigests)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", HourlyStream.scratchDir("graft_ckpt_"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    s.table(name).orderBy("doc_id")
  }
}
