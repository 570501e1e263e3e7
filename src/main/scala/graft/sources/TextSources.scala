package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Line-delimited corpus sources: JSONL (the interchange format of LLM
  * training corpora) and CSV, both SCHEMA-FIRST.
  *
  * The explicit schema is the point: `spark.read.json` without one runs a
  * full inference pass over the data before the real read — at 100 TB
  * that is a second scan of the corpus for zero information the pipeline
  * doesn't already have. With a schema the read is single-pass, splittable
  * per line, and malformed lines degrade per the chosen mode instead of
  * poisoning inference.
  *
  * Modes mirror the ingest contract of `WeatherIngest.parse` (SURVEY §2
  * P2): PERMISSIVE turns a corrupt line into nulls (plus the raw line in
  * `_corrupt_record` if the schema carries that column) so one bad
  * document never kills a corpus-scale job; FAILFAST is for contracts
  * where silence is worse than failure. */
object TextSources {

  /** The `documents` table schema (the JSONL corpus exchange shape). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readJsonl(s: SparkSession, path: String,
      schema: StructType = documentsSchema,
      failFast: Boolean = false): DataFrame =
    s.read.schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** One JSON object per line, newline-delimited — safe to split at any
    * byte offset, which is what keeps the 100 TB read parallel. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readCsv(s: SparkSession, path: String,
      schema: StructType = documentsSchema,
      failFast: Boolean = false): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
