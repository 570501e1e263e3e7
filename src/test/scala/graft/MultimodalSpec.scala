package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("media table: payload bytes match source text length (UTF-8)") {
    val meta = Multimodal.mediaMeta(spark, TestSpark.sf).collect()
    assert(meta.length === 500)
    val kinds = meta.map(_.getString(1)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("metadata projection prunes the payload column at the scan") {
    val plan = Multimodal.mediaMeta(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the parquet scan must only read the columns meta needs
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("props"))
  }

  test("feature extraction: fixed-width vectors, deterministic across partitionings") {
    val f1 = Multimodal.extractFeatures(spark, TestSpark.sf).collect()
    assert(f1.length === 500)
    assert(f1.forall(_.getSeq[Float](3).length === 8))
    assert(f1.forall(r => r.getLong(2) > 0))
    val again = Multimodal.extractFeatures(spark, TestSpark.sf).collect()
    assert(f1.map(_.getSeq[Float](3)).toSeq === again.map(_.getSeq[Float](3)).toSeq)
  }

  test("scalar feature projection matches the array variant, column-per-dim") {
    val scalars = Multimodal.extractFeatureScalars(spark, TestSpark.sf)
    assert(scalars.columns.toSeq ===
      Seq("media_id", "kind", "n_bytes") ++ (0 until 8).map(i => s"f$i"))
    val arr = Multimodal.extractFeatures(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    val sc = scalars.collect()
    assert(sc.length === 500)
    sc.foreach { r =>
      val expect = arr(r.getLong(0))
      (0 until 8).foreach { i =>
        assert(r.getDouble(3 + i) === expect(i).toDouble)
      }
    }
  }

  test("resize: images only, payload shrinks, metadata tracks the ratio") {
    val out = Multimodal.resizeImages(spark, TestSpark.sf, targetWidth = 64)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1) == "image"))
    // deterministic across runs
    val again = Multimodal.resizeImages(spark, TestSpark.sf, targetWidth = 64)
      .collect()
    assert(out.map(_.getString(5)).toSeq === again.map(_.getString(5)).toSeq)
    // metadata contract: resized width never exceeds source-derived bound
    assert(out.forall(r => r.getInt(2) >= 1 && r.getLong(4) >= 1))
  }

  test("frame sampling: n frames per video, fixed frame size") {
    val frames = Multimodal.sampleFrames(spark, TestSpark.sf, n = 4,
      frameBytes = 16).collect()
    assert(frames.nonEmpty)
    val perMedia = frames.groupBy(_.getLong(0))
    assert(perMedia.values.forall(_.length === 4))
    assert(frames.forall(_.getLong(2) === 16))
  }

  test("phash: identical payloads at Hamming 0, a small edit stays " +
      "near, unrelated payloads stay far") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("text")).limit(8).collect().map(_.getString(0))
    val probes = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong * 10, t), // original
        (i.toLong * 10 + 1, t), // exact copy
        (i.toLong * 10 + 2, t.replaceFirst("[aeiou]", "#"))) // 1-char edit
    }.toSeq.toDF("id", "txt")
    val hashed = probes
      .select(col("id"), Multimodal.phash64(encode(col("txt"), "UTF-8"))
        .as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    texts.indices.foreach { i =>
      assert(ham(hashed(i * 10L), hashed(i * 10L + 1)) === 0)
      // one changed char perturbs <= 4 distinct 4-grams: Hamming stays
      // well under the unrelated-pair expectation of ~32
      assert(ham(hashed(i * 10L), hashed(i * 10L + 2)) <= 20,
        s"edit drifted too far for probe $i")
    }
    // unrelated documents: mean Hamming near 32 (random-bit model)
    val far = for (i <- texts.indices; j <- texts.indices if i < j)
      yield ham(hashed(i * 10L), hashed(j * 10L))
    assert(far.sum.toDouble / far.size > 20.0, s"mean ${far.sum.toDouble / far.size}")
  }

  test("PPM decode: encode/decode round-trips every pixel; malformed " +
      "payloads fail loudly") {
    val id = 42L
    val (w, h) = (Multimodal.ppmWidth(id), Multimodal.ppmHeight(id))
    val payload = Multimodal.ppmEncode(id, w, h)
    // a genuine P6 binary: ASCII magic + dims header + packed RGB
    assert(new String(payload.take(2), "US-ASCII") === "P6")
    val (dw, dh, px) = Multimodal.decodePpm(payload)
    assert((dw, dh) === (w, h))
    assert(px.length === w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert((px((y * w + x) * 3 + c) & 0xff) ===
        Multimodal.pixelByte(id, y, x, c),
        s"pixel ($x,$y,$c) corrupted through encode/decode")
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("not an image".getBytes)
    }
    intercept[IllegalArgumentException] { // truncated pixel section
      Multimodal.decodePpm(payload.dropRight(1))
    }
  }

  test("decoded features: channel sums recovered THROUGH the binary " +
      "decode equal the closed-form pixel formula") {
    val rows = Multimodal.decodedFeatures(spark, TestSpark.sf).collect()
    assert(rows.length === 167) // the image third of 500 docs
    rows.take(5).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (Multimodal.ppmWidth(id), Multimodal.ppmHeight(id))
      assert((r.getInt(1), r.getInt(2)) === (w, h))
      val expSumR = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pixelByte(id, y, x, 0).toLong).sum
      assert(r.getLong(3) === expSumR, s"sum_r mismatch for image $id")
      assert(r.getDouble(6) ===
        math.floor(expSumR.toDouble / (w * h) * 1e6) / 1e6)
    }
  }

  test("decoded resize: nearest-neighbor halved dims, strided sums, and " +
      "the first/last probe bytes hit the exact source pixels") {
    val rows = Multimodal.resizeDecoded(spark, TestSpark.sf).collect()
    assert(rows.length === 167)
    rows.take(5).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (Multimodal.ppmWidth(id), Multimodal.ppmHeight(id))
      val (ow, oh) = (math.max(w / 2, 1), math.max(h / 2, 1))
      assert((r.getInt(1), r.getInt(2)) === (ow, oh))
      val expSumG = (for (y <- 0 until oh; x <- 0 until ow)
        yield Multimodal.pixelByte(id, 2 * y, 2 * x, 1).toLong).sum
      assert(r.getLong(4) === expSumG, s"sum_g mismatch for image $id")
      assert(r.getInt(6) === Multimodal.pixelByte(id, 0, 0, 0))
      assert(r.getInt(7) ===
        Multimodal.pixelByte(id, 2 * (oh - 1), 2 * (ow - 1), 2))
    }
  }

  test("WAV decode: RIFF chunk walk round-trips every s16le sample; " +
      "malformed and non-PCM payloads fail loudly") {
    val id = 130L // formula crosses zero within this clip: both signs
    val payload = Multimodal.wavEncode(id)
    assert(new String(payload.take(4), "US-ASCII") === "RIFF")
    val xs = Multimodal.decodeWav(payload)
    assert(xs.length === Multimodal.wavSamples(id))
    xs.zipWithIndex.foreach { case (v, i) =>
      assert(v === Multimodal.sampleVal(id, i),
        s"sample $i corrupted through encode/decode")
    }
    // negative samples really decode as negatives (sign extension)
    assert(xs.exists(_ < 0) && xs.exists(_ > 0))
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("0123456789".getBytes ++ new Array[Byte](40))
    }
    intercept[IllegalArgumentException] { // truncated data chunk
      Multimodal.decodeWav(payload.dropRight(3))
    }
  }

  test("audio features: stats recovered THROUGH the PCM decode equal " +
      "the closed-form sample formula") {
    val rows = Multimodal.audioFeatures(spark, TestSpark.sf).collect()
    assert(rows.length === 167) // the audio third of 500 docs
    rows.take(5).foreach { r =>
      val id = r.getLong(0)
      val n = Multimodal.wavSamples(id)
      val exp = (0 until n).map(Multimodal.sampleVal(id, _))
      assert(r.getInt(1) === n)
      assert(r.getLong(2) === exp.map(_.toLong).sum)
      assert(r.getLong(3) === exp.map(v => math.abs(v).toLong).sum)
      assert(r.getInt(4) === exp.min && r.getInt(5) === exp.max)
    }
  }

  test("PNG decode: the payload is a genuine compressed PNG bitstream " +
      "and the JDK decode round-trips every fixture pixel") {
    for (id <- Seq(0L, 5L, 61L)) {
      val w = Multimodal.ppmWidth(id); val h = Multimodal.ppmHeight(id)
      val png = Multimodal.pngEncode(id, w, h)
      // PNG signature: a real bitstream, not repackaged raw pixels
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
        png(2) === 'N'.toByte && png(3) === 'G'.toByte)
      val (dw, dh, px) = Multimodal.decodeViaRegistry(png)
      assert(dw === w && dh === h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert((px((y * w + x) * 3 + c) & 0xff) ===
          Multimodal.pixelByte(id, y, x, c),
          s"pixel ($x,$y,$c) of image $id")
    }
    // a non-image payload fails loudly, never emits garbage pixels
    intercept[IllegalArgumentException] {
      Multimodal.decodeViaRegistry("not a png".getBytes("UTF-8"))
    }
  }

  test("PNG decoded features and resize equal the PPM arithmetic on " +
      "the same formula — codec-independent stats contract") {
    // the two lanes share pixel formulas, so for any id the PNG lane's
    // numbers must equal a direct formula replay (the oracle's claim,
    // checked here without DuckDB for one row)
    val rows = Multimodal.decodedFeaturesPng(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val r = rows.head
    val id = r.getLong(0)
    val w = Multimodal.ppmWidth(id); val h = Multimodal.ppmHeight(id)
    val expSum = (c: Int) => (for (y <- 0 until h; x <- 0 until w)
      yield Multimodal.pixelByte(id, y, x, c).toLong).sum
    assert(r.getInt(1) === w && r.getInt(2) === h)
    assert(r.getLong(3) === expSum(0))
    assert(r.getLong(4) === expSum(1))
    assert(r.getLong(5) === expSum(2))
    val rz = Multimodal.resizeDecodedPng(spark, TestSpark.sf).collect().head
    val ow = math.max(w / 2, 1); val oh = math.max(h / 2, 1)
    assert(rz.getInt(1) === ow && rz.getInt(2) === oh)
    assert(rz.getLong(3) === (for (y <- 0 until oh; x <- 0 until ow)
      yield Multimodal.pixelByte(id, 2 * y, 2 * x, 0).toLong).sum)
    assert(rz.getInt(6) === Multimodal.pixelByte(id, 0, 0, 0))
    assert(rz.getInt(7) ===
      Multimodal.pixelByte(id, 2 * (oh - 1), 2 * (ow - 1), 2))
  }

  test("phash dedup gate: exactly the planted copies, all bands " +
      "shared, and the chain finds nothing at Hamming > cap for them") {
    val got = Multimodal.phashDedupPlanted(spark, TestSpark.sf).collect()
    val expect = Tables.load(spark, TestSpark.sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 100 === 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.map(_.getLong(0)).toSeq === expect.toSeq)
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + graft.operators.Dedup.PlantOffset)
      assert(r.getInt(2) === 0 && r.getInt(3) === 4 && r.getBoolean(4))
    }
  }

  test("JPEG: the payload is a genuine lossy bitstream; decode recovers " +
      "dims exactly and channel means within a fraction of the gate's " +
      "2.0 tolerance") {
    for (id <- Seq(1L, 7L, 64L)) {
      val w = Multimodal.ppmWidth(id); val h = Multimodal.ppmHeight(id)
      val jpg = Multimodal.jpegEncode(id)
      // JPEG SOI marker: a real entropy-coded bitstream
      assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8)
      val (dw, dh, px) = Multimodal.decodeViaRegistry(jpg) // sniffs format
      assert(dw === w && dh === h)
      // lossy: pixels differ, but each channel MEAN stays inside 1.5
      // (measured max 1.0 — chroma DC quantization) against the gate's
      // 2.0, while a channel-order bug would read 25
      for (c <- 0 until 3) {
        val dec = (for (y <- 0 until h; x <- 0 until w)
          yield (px((y * w + x) * 3 + c) & 0xff).toLong).sum / (w * h).toDouble
        val exact = (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.jpegPixelByte(id, y, x, c).toLong).sum /
          (w * h).toDouble
        assert(math.abs(dec - exact) <= 1.5,
          s"channel $c mean drift ${math.abs(dec - exact)} on image $id")
      }
    }
  }

  test("mp4: payload is a genuine ISO-BMFF container; the box walk " +
      "recovers brand/duration/tracks/handlers/codecs FROM the bytes " +
      "and rescales duration with the PARSED timescale") {
    for (id <- Seq(2L, 5L, 8L, 35L, 170L)) {
      val p = Multimodal.mp4Encode(id)
      // leads with a real ftyp box (size + 4CC + major brand)
      assert(new String(p, 4, 4, "US-ASCII") === "ftyp")
      assert(new String(p, 8, 4, "US-ASCII") === "isom")
      val m = Multimodal.parseMp4(id, p)
      assert(m.brand === "isom")
      assert(m.timescale === 600L, "stored at the QuickTime timescale")
      assert(m.duration_ms === 1000L + (id % 17) * 250L)
      assert(m.n_tracks === 1 + (id % 2).toInt)
      assert(m.handlers === (if (id % 2 == 1) "vide,soun" else "vide"))
      assert(m.codecs === (if (id % 2 == 1) "avc1,mp4a" else "avc1"))
    }
    // duration genuinely comes from mvhd units ÷ timescale: patch the
    // stored 32-bit duration field and the parsed ms must track the
    // BYTES, diverging from the id's closed form
    val id = 5L
    val p = Multimodal.mp4Encode(id)
    val pos = (0 until p.length - 4).find(i =>
      p(i) == 'm' && p(i + 1) == 'v' && p(i + 2) == 'h' &&
        p(i + 3) == 'd').get
    // mvhd payload: ver/flags(4) ctime(4) mtime(4) timescale(4) then
    // duration — 20 bytes past the type 4CC
    val d = pos + 20
    p(d) = 0; p(d + 1) = 0; p(d + 2) = 4; p(d + 3) = 0xb0.toByte // 1200
    assert(Multimodal.parseMp4(id, p).duration_ms === 2000L,
      "1200 units at timescale 600 must parse as 2000 ms")
    // a malformed payload fails loudly, never emits garbage metadata
    intercept[IllegalArgumentException] {
      Multimodal.parseMp4(0L, "notanmp4boxstream!!".getBytes("UTF-8"))
    }
    // the Spark lane reproduces the closed forms end-to-end
    val rows = Multimodal.mp4Meta(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mid = r.getLong(0)
      assert(mid % 3 === 2L)
      assert(r.getString(1) === "isom")
      assert(r.getLong(2) === 600L)
      assert(r.getLong(3) === 1000L + (mid % 17) * 250L)
      assert(r.getInt(4) === 1 + (mid % 2).toInt)
      assert(r.getString(6) === (if (mid % 2 == 1) "avc1,mp4a" else "avc1"))
    }
  }

  test("JPEG gate: every image decodes with exact dims and " +
      "features_close TRUE — the oracle's claim") {
    val rows = Multimodal.jpegDecodeGate(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === Multimodal.ppmWidth(id))
      assert(r.getInt(2) === Multimodal.ppmHeight(id))
      assert(r.getBoolean(3), s"image $id outside tolerance")
    }
  }
}
