package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * `stubDecodeFeatures` derives a deterministic fake feature vector from
  * the payload bytes (clearly marked below). Everything around it is the
  * real Spark plumbing this pipeline needs at 100 TB:
  *
  * - media rows are (id, kind, payload binary, meta struct) — schema-first,
  *   so Parquet stores payloads as raw byte arrays with metadata columns
  *   prunable without touching payload bytes;
  * - feature extraction runs as `mapPartitions` over a typed Dataset —
  *   the Scala analog of `mapInPandas` batch processing: per-partition
  *   iterator in, iterator out, so a decoder can amortize model/codec
  *   init per partition (exactly where a real JNI decoder would live);
  * - frame sampling is a pure expression (binary `substr` windows) —
  *   no shuffle, prunable, codegen'd.
  */
object Multimodal {

  /** Typed media row (payload is an opaque byte blob). */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      format: String, width: Int, height: Int, duration_ms: Int)

  /** Extracted features per media item. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** Build a deterministic media table from `documents` (the driver's only
    * blob-able source): payload = UTF-8 bytes of the text, kind/meta
    * derived from doc_id. At 100 TB this table would be ingested directly
    * from object storage with payloads in parquet binary columns. */
  def mediaFromDocuments(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10).cast("int").as("duration_ms"))

  /** Metadata projection (payload column pruned — the scan must not read
    * payload bytes; verified via explain in tests). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(s, dir)
      .select(col("media_id"), col("kind"), col("format"),
        length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("media_id")

  /** ======== STUB ========
    * Deterministic fake "decode + embed": 8 floats derived from the md5
    * digest of the payload — each feature is a 16-bit big-endian slice of
    * the digest scaled to [0, 1) (n/65536 is a power-of-two divide, so the
    * float is exact and the double projection is bit-identical to any
    * engine computing hexint/65536.0 — this is what makes `mm_features`
    * oracle-checkable in DuckDB). A real deployment replaces ONLY this
    * function with a codec/model call (per-partition init amortized by
    * mapPartitions); the signature — bytes in, fixed-width float vector
    * out — is the real contract. */
  private[multimodal] def stubDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(8) { j =>
      val n = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
      (n / 65536.0).toFloat
    }
  }

  /** Feature extraction over the media table: typed mapPartitions (batch
    * iterator shape — decoder init happens once per partition, not per
    * row). */
  def extractFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaFromDocuments(s, dir).as[MediaRow]
    media.mapPartitions { rows =>
      // [real decoder init would go here: one codec/model per partition]
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          stubDecodeFeatures(m.payload))
      }
    }.toDF().orderBy("media_id")
  }

  /** Gate-stable scalar projection of `extractFeatures`: each feature
    * dimension as its own double column (`f0..f7`). The raw
    * `array<float>` variant stays the library API; this shape exists
    * because downstream tabular consumers (and the driver's row
    * comparator) need sortable/hashable scalars, not nested arrays. */
  def extractFeatureScalars(s: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(s, dir)
    val fCols = (0 until 8).map(i =>
      col("features").getItem(i).cast("double").as(s"f$i"))
    feats.select(Seq(col("media_id"), col("kind"), col("n_bytes")) ++ fCols: _*)
      .orderBy("media_id")
  }

  /** ======== STUB ========
    * Deterministic fake "resize": stride-sample every k-th payload byte,
    * where k is chosen from the source/target width ratio. A real
    * deployment replaces ONLY this function with a codec resize (JNI /
    * java.awt) — bytes in, bytes out, smaller. */
  private[multimodal] def stubResizeBytes(payload: Array[Byte],
      ratio: Int): Array[Byte] = {
    val k = math.max(ratio, 1)
    val out = new Array[Byte]((payload.length + k - 1) / k)
    var i = 0
    while (i < out.length) { out(i) = payload(i * k); i += 1 }
    out
  }

  /** Resized media row: payload swapped for the downsampled bytes and the
    * typed metadata recomputed — the contract a real resize keeps. */
  case class ResizedRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, n_bytes: Long)

  /** Image resize over the media table (images only — pruned before the
    * payload bytes are touched). Typed mapPartitions like
    * `extractFeatures`: per-partition init slot for a real codec, batch
    * iterator shape, metadata recomputed from the target dims. */
  def resizeImages(s: SparkSession, dir: String,
      targetWidth: Int = 64): DataFrame = {
    import s.implicits._
    val media = mediaFromDocuments(s, dir)
      .filter(col("kind") === "image").as[MediaRow]
    media.mapPartitions { rows =>
      // [real decoder/scaler init would go here, once per partition]
      rows.map { m =>
        val ratio = math.max(m.width / math.max(targetWidth, 1), 1)
        val resized = stubResizeBytes(m.payload, ratio)
        ResizedRow(m.media_id, m.kind, resized,
          math.max(m.width / ratio, 1), math.max(m.height / ratio, 1),
          resized.length.toLong)
      }
    }.toDF()
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("n_bytes"), md5(col("payload")).as("payload_md5"))
      .orderBy("media_id")
  }

  /** ======== STUB (hash only) ========
    * Perceptual hash of a media payload. A real deployment computes a
    * DCT pHash / aHash over the DECODED image (replace only this
    * function); the stub derives the same CONTRACT — a 64-bit hash
    * whose Hamming distance is small for near-identical payloads and
    * ~32 for unrelated ones — from SimHash over the payload's distinct
    * byte 4-grams (the corpus is ASCII text, so byte 4-grams are char
    * 4-grams). Everything downstream (banding, bucket join, Hamming
    * verify) is the real 100 TB image-dedup plumbing either way. */
  def phash64(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.SketchExpressions.simhash(
      graft.functions.SketchExpressions.charNgramSet(
        payload.cast("string"), 4))

  /** Perceptual-hash near-dup detection over the media table — the
    * image-dedup lane every multimodal training corpus runs (exact
    * byte-dedup misses re-encoded/resized copies; embedding dedup is
    * 1000× the compute): 64-bit [[phash64]] per payload, banded into
    * 4×16-bit keys (pigeonhole: Hamming ≤ 3 guarantees one exact band
    * match), candidates bucket-joined per band under the
    * [[graft.operators.Dedup.minhashCandidates]] cap discipline, then
    * verified by exact Hamming distance (`bit_count(xor)`) — never
    * all-pairs, at any scale.
    *
    * Emitted relation: the planted closed-form gate (the
    * `dedup_clusters_planted` discipline) — exact payload copies of
    * every doc_id ≡ 3 (mod 100) are planted at +PlantOffset; each MUST
    * come back through the banding+verify chain with Hamming 0 and all
    * 4 bands shared, so a broken band key, bucket join, or xor path
    * erases rows and fails the hash gate. Precondition (shared with the
    * minhash gates): no natural band bucket exceeds the cap at the
    * tested SFs, else a planted pair could be dropped with it. */
  def phashDedupPlanted(s: SparkSession, dir: String,
      hammingMax: Int = 3, maxBucket: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val plantOffset = graft.operators.Dedup.PlantOffset
    val media = mediaFromDocuments(s, dir)
      .select(col("media_id"), col("payload"))
    val planted = media.filter(col("media_id") % 100 === 3)
      .withColumn("media_id", col("media_id") + plantOffset)
    val hashed = media.unionByName(planted)
      .select(col("media_id"), phash64(col("payload")).as("ph"))
    val bands = hashed.select(col("media_id"), col("ph"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("ph"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_idx", "band_val")))
      .withColumn("bsz", count(lit(1))
        .over(Window.partitionBy(col("band_idx"), col("band_val"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val a = bands.select(col("band_idx"), col("band_val"),
      col("media_id").as("media_a"), col("ph").as("ph_a"))
    val b = bands.select(col("band_idx"), col("band_val"),
      col("media_id").as("media_b"), col("ph").as("ph_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("media_a") < col("media_b"))
      .groupBy(col("media_a"), col("media_b"), col("ph_a"), col("ph_b"))
      .agg(count(lit(1)).as("shared_bands"))
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= hammingMax)
      .filter(col("media_b") === col("media_a") + plantOffset &&
        col("media_a") % 100 === 3)
      .select(col("media_a"), col("media_b"),
        col("hamming").cast("int").as("hamming"),
        col("shared_bands").cast("int").as("shared_bands"),
        lit(true).as("dup"))
      .orderBy("media_a")
  }

  /** Frame sampling: cut `n` evenly spaced fixed-size byte windows from
    * each payload (stand-in for video frame extraction; the windowing,
    * explode shape, and per-frame rows are the real plumbing). Pure
    * expressions — no shuffle.
    *
    * Integer stride (explicit floor) and md5 frame digests keep the
    * operator oracle-checkable: both engines floor the same double and
    * md5 the same bytes (the synthetic corpus is ASCII, so the oracle's
    * varchar substring addresses the same byte offsets). */
  def sampleFrames(s: SparkSession, dir: String, n: Int = 4,
      frameBytes: Int = 16): DataFrame = {
    val media = mediaFromDocuments(s, dir)
      .filter(col("kind") === "video")
    val stride = greatest(
      floor((length(col("payload")) - frameBytes) / n).cast("int"), lit(1))
    media
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
          col("payload").substr(i * stride + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_hash"))
      .orderBy("media_id", "frame_idx")
  }
}
