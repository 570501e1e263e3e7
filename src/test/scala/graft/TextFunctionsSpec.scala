package graft

import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchExpressions
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token counts: whitespace and BPE-ish") {
    val df = one("Hello, world!  This is   a test.")
      .select(tokenCount(col("text")).as("ws"),
        bpeTokenCount(col("text")).as("bpe"))
    val r = df.head()
    assert(r.getLong(0) === 6)
    // Hello , world ! This is a test . -> 9 pieces
    assert(r.getLong(1) === 9)
  }

  test("punctuation and token-length stats") {
    val r = one("ab, cd! ef")
      .select(punctCount(col("text")), avgTokenLen(col("text"))).head()
    assert(r.getLong(0) === 2)
    assert(r.getDouble(1) === 8.0 / 3.0) // "ab," "cd!" "ef"
  }

  test("stopword ratio and quality score bounds") {
    val prose = one("the cat is on the mat and it is happy")
    val spam = one("buy buy buy cheap cheap pills pills pills")
    val pq = prose.select(stopwordRatio(col("text")),
      qualityScore(col("text"))).head()
    val sq = spam.select(stopwordRatio(col("text")),
      qualityScore(col("text"))).head()
    assert(pq.getDouble(0) > 0.4)
    assert(sq.getDouble(0) === 0.0)
    assert(pq.getDouble(1) > sq.getDouble(1))
    assert(pq.getDouble(1) <= 1.0 && sq.getDouble(1) >= 0.0)
  }

  test("language-ID picks the marker-dominant language") {
    val en = one("the cat and the dog sat in that house of it")
    val es = one("el perro y la casa de que un gato en los campos")
    assert(en.select(langId(col("text"))).head()
      .getStruct(0).getString(0) === "en")
    assert(es.select(langId(col("text"))).head()
      .getStruct(0).getString(0) === "es")
  }

  test("repetition scores match a plain-Scala reimplementation") {
    def frac(ws: Array[String], n: Int): Double = {
      if (ws.length <= n) 0.0
      else {
        val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
        val raw = 1.0 - grams.distinct.length.toDouble / grams.length
        math.floor(raw * 1e6) / 1e6
      }
    }
    def top(ws: Array[String]): Double =
      math.floor(ws.groupBy(identity).values.map(_.length).max.toDouble
        / ws.length * 1e6) / 1e6
    val texts = graft.Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.operators.TextAnalysis
      .repetitionScores(spark, TestSpark.sf).collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val ws = texts(r.getLong(0)).trim.split("\\s+").filter(_.nonEmpty)
      assert(r.getDouble(1) === frac(ws, 2), s"bigram doc ${r.getLong(0)}")
      assert(r.getDouble(2) === frac(ws, 3), s"trigram doc ${r.getLong(0)}")
      assert(r.getDouble(3) === top(ws), s"topword doc ${r.getLong(0)}")
    }
    // signals are non-degenerate on the corpus: some repetition exists
    assert(rows.exists(_.getDouble(1) > 0.0))
  }

  test("unigram log-prob: counts reconcile and scores behave like an LM") {
    val rows = graft.operators.TextAnalysis
      .unigramLogProb(spark, TestSpark.sf).collect()
    val stats = graft.operators.TextAnalysis
      .textStats(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.length === stats.size)
    rows.foreach { r =>
      val (id, n, d, minCtf, lp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      // token accounting matches the independent text_stats tokenizer
      assert(n === stats(id), s"doc $id token count")
      assert(d >= 1 && d <= n)
      assert(minCtf >= 1)
      // probabilities are < 1 → every mean log-prob is strictly negative
      assert(lp < 0.0, s"doc $id logprob")
    }
    // the signal separates documents (not a constant)
    assert(rows.map(_.getDouble(4)).distinct.length > 1)
  }

  test("quality logit: sigmoid consistency and a real decision boundary") {
    val rows = graft.operators.TextAnalysis
      .qualityLogit(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lg, p, keep) = (r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      assert(p > 0.0 && p < 1.0)
      // keep decides on the raw logit; the truncated pair must agree up to
      // the 1e-6 floor at the boundary
      if (keep) assert(p >= 0.5 - 1e-6 && lg >= 0.0)
      else assert(p <= 0.5 && lg <= 0.0)
    }
    // the classifier separates the corpus (both classes observed)
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("gopher filter: keep is exactly the rule conjunction and both " +
      "outcomes occur") {
    val rows = graft.operators.TextAnalysis
      .gopherFilter(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      val expect = r.getAs[Boolean]("ok_len") &&
        r.getAs[Boolean]("ok_wordlen") && r.getAs[Boolean]("ok_stop") &&
        r.getAs[Boolean]("ok_top") && r.getAs[Boolean]("ok_repeat")
      assert(r.getAs[Boolean]("keep") === expect)
    }
    val keeps = rows.count(_.getAs[Boolean]("keep"))
    assert(keeps > 0 && keeps < rows.length) // no vacuous thresholds
  }

  test("bigram log-prob: position counts reconcile and scores are negative") {
    import org.apache.spark.sql.functions._
    val scored = graft.operators.TextAnalysis
      .bigramLogProb(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    // every (c+1)/(c_a+V) probability is < 1, so the mean log is < 0
    assert(scored.values.forall(_.getAs[Double]("mean_logprob") < 0.0))
    // a doc with n tokens has exactly n-1 scored positions
    val nTok = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    scored.foreach { case (id, r) =>
      assert(r.getAs[Long]("n_bigrams") === nTok(id) - 1)
    }
  }

  test("dsir weights: English documents score higher than non-English " +
      "on the lang=en target, and weights are finite") {
    import org.apache.spark.sql.functions._
    val w = graft.operators.TextAnalysis.dsirWeights(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite))
    val langs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val en = w.collect { case (id, v) if langs(id) == "en" => v }
    val other = w.collect { case (id, v) if langs(id) != "en" => v }
    assert(en.nonEmpty && other.nonEmpty)
    // the estimator's whole point: target-domain docs look MORE like the
    // target LM than the corpus LM (mean weight positive), non-target
    // docs less (negative). The gap is small when the corpus is mostly
    // target-language — the corpus LM is then close to the target LM —
    // so the structural check is the sign split, not a wide margin.
    val mEn = en.sum / en.size
    val mOther = other.sum / other.size
    assert(mEn > 0 && mOther < 0 && mEn > mOther,
      s"mean en weight $mEn must be positive and exceed non-en $mOther")
  }

  test("bpe merge step: pair counts match an independent Scala recompute " +
      "and the top pair is the true argmax") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.TextAnalysis.bpeMergeStep(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // independent recompute: word freqs -> weighted adjacent char pairs
    val words = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+").filter(_.nonEmpty))
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong)
    val pairs = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freq; i <- 0 until w.length - 1)
      pairs(w.substring(i, i + 2)) = pairs.getOrElse(w.substring(i, i + 2), 0L) + f
    val expected = pairs.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq === expected)
  }

  test("bpe_iterate matches an independent classic BPE trainer " +
      "(symbol-list fold, no string-replace encoding)") {
    // ground truth: the textbook algorithm over explicit symbol vectors —
    // a deliberately DIFFERENT rendering from the operator's wrapped-
    // string replace, so encoding bugs (boundary matches, overlap
    // handling) cannot cancel out
    val rounds = 6
    val toks = Tables.load(spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+").filter(_.nonEmpty))
    var words: Map[Vector[String], Long] = toks.groupBy(identity)
      .map { case (t, occ) =>
        t.map(_.toString).toVector -> occ.length.toLong }
    def mergeSeq(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val expected = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.nonEmpty) {
        // tie-break on the wrapped pattern string, the operator's order
        val ((a, b), n) = counts.toSeq
          .minBy { case ((x, y), m) => (-m, s" $x  $y ") }
        expected += ((r, s" $a  $b ", a + b, n))
        words = words.map { case (syms, c) => mergeSeq(syms, a, b) -> c }
      }
    }
    val got = graft.operators.TextAnalysis
      .bpeIterate(spark, TestSpark.sf, rounds).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
  }

  test("dsir_resample: keep decision replays min(1, exp(w)) acceptance " +
      "against the hash uniform; target-like docs always survive") {
    val rows = graft.operators.TextAnalysis.dsirResample(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, u, keep) =>
      assert(u >= 0.0 && u < 1.0, s"doc $id uniform out of range: $u")
      assert(keep === (u < math.min(1.0, math.exp(w))),
        s"doc $id: keep must be the exact acceptance decision")
      if (w >= 0.0) assert(keep, s"doc $id: weight>=0 must always keep")
    }
    // the resample genuinely filters (some negative-weight docs rejected)
    assert(rows.exists(!_._4), "some documents must be rejected")
    assert(rows.count(_._4) > rows.length / 4, "most docs survive at T=1")
  }

  test("bpe_encode: per-document symbol accounting matches an " +
      "independent fold encoder applying the trained merges") {
    val merges = graft.operators.TextAnalysis
      .bpeIterate(spark, TestSpark.sf, 6).collect()
      .map { r => val Array(a, b) = r.getString(1).trim.split("  "); (a, b) }
    def encode(tok: String): Int = {
      var syms = tok.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    val expected = Tables.load(spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else Some(r.getLong(0) -> (toks.length.toLong,
          toks.map(_.length.toLong).sum, toks.map(encode(_).toLong).sum))
      }.toMap
    val got = graft.operators.TextAnalysis.bpeEncode(spark, TestSpark.sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
    // merging can only shrink: every doc compresses or stays equal
    got.values.foreach { case (_, in, out) => assert(out <= in) }
  }

  test("lang confusion: cells reconcile with predictions, rows sum to 1") {
    val preds = graft.operators.TextAnalysis
      .langIdPredictions(spark, TestSpark.sf).collect()
      .groupBy(r => (r.getString(1), r.getString(2)))
      .view.mapValues(_.length.toLong).toMap
    val cells = graft.operators.TextAnalysis
      .langConfusion(spark, TestSpark.sf).collect()
    assert(cells.map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap === preds)
    cells.groupBy(_.getString(0)).foreach { case (lab, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      // t6 truncation loses < 1e-6 per cell
      assert(s > 1.0 - 1e-5 * rows.length && s <= 1.0 + 1e-9, lab)
    }
  }

  test("bpe_coverage reconciles with bpe_encode and fertility is sane") {
    val perDoc = graft.operators.TextAnalysis.bpeEncode(spark, TestSpark.sf)
      .collect()
    val perSrc = graft.operators.TextAnalysis.bpeCoverage(spark, TestSpark.sf)
      .collect()
    // the rollup conserves the token/symbol totals of the per-doc report
    assert(perSrc.map(_.getLong(1)).sum === perDoc.map(_.getLong(1)).sum)
    assert(perSrc.map(_.getLong(2)).sum === perDoc.map(_.getLong(2)).sum)
    assert(perSrc.map(_.getLong(3)).sum === perDoc.map(_.getLong(3)).sum)
    perSrc.foreach { r =>
      val compression = r.getDouble(4)
      val fertility = r.getDouble(5)
      // merging only shrinks; six merges cannot shrink below ~nothing
      assert(compression > 0.0 && compression <= 1.0, r.getString(0))
      // a symbol per token at minimum (a token is >= 1 symbol)
      assert(fertility >= 1.0, r.getString(0))
    }
  }

  test("quality_train: the gradient step is internally consistent and " +
      "DESCENDS the logistic loss against the Gopher labels") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchExpressions
import graft.functions.TextFunctions._
    val step = graft.operators.TextAnalysis
      .qualityLogitTrain(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(step.keySet === Set("bias", "stopword_ratio", "punct_ratio",
      "len_feat", "avg_len_feat"))
    // w_new is exactly the t6-floored update from w_old and grad
    step.foreach { case (f, (wOld, grad, wNew)) =>
      assert(grad == grad && !grad.isInfinite, s"$f grad must be finite")
      assert(wNew === graft.functions.Num.t6d(wOld - 0.5 * grad), f)
    }
    assert(step.exists(_._2._2 != 0.0), "at least one nonzero gradient")
    // the step must reduce mean logistic loss on its own training set
    val labels = graft.operators.TextAnalysis.gopherFilter(spark, TestSpark.sf)
      .select(col("doc_id"), col("keep"))
    val sw = stopwordRatio(col("text"))
    val pr = punctRatio(col("text"))
    val lenF = least(tokenCount(col("text")).cast("double") / 256.0, lit(1.0))
    val alF = least(avgTokenLen(col("text")) / 8.0, lit(1.0))
    def z(w: Map[String, Double]): org.apache.spark.sql.Column =
      lit(w("bias")) + sw * w("stopword_ratio") + pr * w("punct_ratio") +
        lenF * w("len_feat") + alF * w("avg_len_feat")
    def loss(w: Map[String, Double]): Double =
      Tables.load(spark, TestSpark.sf, "documents")
        .join(labels, Seq("doc_id"))
        .select(when(col("keep"), log(lit(1.0) + exp(-z(w))))
          .otherwise(log(lit(1.0) + exp(z(w)))).as("l"))
        .agg(avg(col("l"))).head.getDouble(0)
    val old = step.view.mapValues(_._1).toMap
    val neu = step.view.mapValues(_._3).toMap
    assert(loss(neu) < loss(old),
      s"gradient step must descend: ${loss(neu)} !< ${loss(old)}")
  }

  test("ppl buckets: all 10 deciles populated, counts reconcile, and " +
      "score ranges are disjoint and ordered") {
    val rows = graft.operators.TextAnalysis.pplBuckets(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getAs[Double]("min_lp"), r.getAs[Double]("max_lp")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0 to 9))
    val total = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(rows.map(_._2).sum === total)
    // deciles: every bucket within a factor-2 band of n/10 (ties shift
    // boundary docs but cannot starve a bucket on a continuous score)
    assert(rows.forall(r => r._2 >= total / 20 && r._2 <= total / 5))
    // bucket ranges never interleave
    for (Array(lo, hi) <- rows.sliding(2))
      assert(lo._4 <= hi._3,
        s"bucket ${lo._1} max ${lo._4} must not exceed bucket ${hi._1} min")
  }

  test("bigram log-prob: bigram-count join is a shuffle join, never a " +
      "broadcast (bigram types grow with corpus size — unigram side only)") {
    val df = graft.operators.TextAnalysis.bigramLogProb(spark, TestSpark.sf)
    df.collect() // force the AQE-final plan
    // the AQE print repeats joins in its "== Initial Plan ==" tail —
    // count only the final section
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "pairs ⋈ cab must shuffle on (a, b):\n" + p.take(1500))
    // exactly one broadcast join remains: the |vocab|-bounded unigram side
    // (the scalar vocab count folds in as a broadcast nested-loop or
    // literal, not a hash join)
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj === 1, s"expected only the unigram broadcast, got $bhj:\n" +
      p.take(1500))
  }

  test("length percentiles: 0 at each source's shortest doc, 1 at its " +
      "longest, monotone in length") {
    val rows = graft.operators.TextAnalysis
      .lengthPercentiles(spark, TestSpark.sf).collect()
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val byLen = rs.sortBy(r => (r.getLong(2), r.getLong(0)))
      assert(byLen.head.getDouble(3) === 0.0, s"$src shortest != 0")
      assert(byLen.last.getDouble(3) >= 0.999999 - 1e-9, s"$src longest != 1")
      val ps = byLen.map(_.getDouble(3))
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    }
  }

  test("quality score is deterministic across evaluations") {
    val d = graft.Tables.load(spark, TestSpark.sf, "documents")
    val a = d.select(col("doc_id"), qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = d.repartition(7).select(col("doc_id"),
      qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }

  test("doremi step: multiplicative-weights identity recomputes from the " +
      "emitted excess, weights normalize, clamp and monotonicity hold") {
    import graft.functions.Num
    val rows = graft.operators.TextAnalysis
      .doremiStep(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    // recompute the update from the emitted excess column alone: the
    // spec is independent of the loss pipeline, pinning the algebra
    val raw = rows.map(r => Num.t6d(1.0 / n * math.exp(r.getDouble(3))))
    val z = raw.map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    rows.zip(raw).foreach { case (r, w) =>
      assert(r.getDouble(4) === Num.t6d(w / z),
        s"${r.getString(0)}: w_new must be the normalized mw update")
      assert(r.getDouble(3) >= 0.0, "excess is clamped at 0")
    }
    // weights sum to 1 within the t6 truncation slack
    val tot = rows.map(_.getDouble(4)).sum
    assert(math.abs(tot - 1.0) < n * 1e-6 + 1e-9, s"sum(w_new)=$tot")
    // monotone: more excess loss never gets less weight
    val sorted = rows.sortBy(_.getDouble(3))
    sorted.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getDouble(4) <= hi.getDouble(4) + 1e-12)
      case _ =>
    }
    // at least one domain sits at the uniform floor (excess 0: a domain
    // at or below the corpus-wide reference always exists)
    assert(rows.exists(_.getDouble(3) === 0.0))
  }

  test("quality calibration: buckets partition the corpus, probabilities " +
      "sit inside their decile, label counts bounded") {
    val rows = graft.operators.TextAnalysis
      .qualityCalibration(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val corpus = Tables.load(spark, TestSpark.sf, "documents")
      .filter(org.apache.spark.sql.functions
        .size(tokens(col("text"))) > 0).count()
    assert(total === corpus, "every scored document lands in one bucket")
    rows.foreach { r =>
      val (b, n, mp, nk) =
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(b >= 0 && b <= 9)
      // the bucket's mean prob lies inside the decile (bucket 9 also
      // holds clamped prob-1.0 rows, so its upper edge is inclusive)
      assert(mp >= b / 10.0 - 1e-9 && mp <= (b + 1) / 10.0 + 1e-9)
      assert(nk >= 0 && nk <= n)
      val frac = r.getDouble(4)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // labels must not be degenerate across the whole curve (some bucket
    // keeps, some bucket drops — otherwise the curve diagnoses nothing)
    assert(rows.exists(_.getLong(3) > 0) &&
      rows.exists(r => r.getLong(3) < r.getLong(1)))
  }

  test("ab test: counts reconcile with quality_logit's keep flags and " +
      "the z statistic matches an independent recompute") {
    import org.apache.spark.sql.functions._
    val row = graft.operators.TextAnalysis
      .abKeepTest(spark, TestSpark.sf).collect().head
    val (na, ka, nb, kb) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    // arms from the shipped scorer's own keep flags
    val keeps = graft.operators.TextAnalysis
      .qualityLogit(spark, TestSpark.sf)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(na === keeps.count(_._1 % 2 == 0).toLong)
    assert(ka === keeps.count(t => t._1 % 2 == 0 && t._2).toLong)
    assert(nb === keeps.count(_._1 % 2 != 0).toLong)
    assert(kb === keeps.count(t => t._1 % 2 != 0 && t._2).toLong)
    val pa = ka.toDouble / na; val pb = kb.toDouble / nb
    val pp = (ka + kb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(row.getDouble(6) - z) < 2e-6)
    assert(row.getBoolean(7) === (math.abs(z) > 1.96))
  }

  test("quality PSI: bands partition both snapshots, shares sum to 1, " +
      "contributions non-negative, total reconciles, and the " +
      "identical-split PSI is exactly zero") {
    val rows = graft.operators.TextAnalysis
      .qualityPsi(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val corpus = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === corpus)
    // PSI contributions are always >= 0: (p-q) and ln(p/q) share sign
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0)
      assert(r.getBoolean(6) === (r.getLong(1) == 0L || r.getLong(2) == 0L))
    }
    // total = decimal sum of the banded contributions (reconciliation
    // to 1e-6: each side is a 6-decimal value, the sum is exact)
    val total = rows.head.getDouble(7)
    val recomputed = rows.map(r => BigDecimal(r.getDouble(5))).sum
    assert((BigDecimal(total) - recomputed).abs < BigDecimal("0.000001"))
    assert(rows.forall(_.getDouble(7) === total))
    // degenerate-drift control: scoring the SAME snapshot on both sides
    // must yield PSI 0 in every band — p == q exactly
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_psi_").toString
    even.union(even.withColumn("doc_id", col("doc_id") + 1))
      .write.parquet(s"$dir/documents.parquet")
    val same = graft.operators.TextAnalysis.qualityPsi(spark, dir).collect()
    assert(same.nonEmpty)
    same.foreach { r =>
      assert(r.getDouble(5) === 0.0 && !r.getBoolean(6))
      assert(r.getDouble(7) === 0.0)
    }
  }

  test("chained_replace: the one-expression merge table equals chained " +
      "replace projections on trained merges, and a 300-merge table " +
      "still COMPILES (codegen-only, no fallback)") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchExpressions
    // 20 trained merges — beyond the contract's 6, so the equality pin
    // covers a merge table deeper than any oracle replays
    val merges = graft.operators.TextAnalysis
      .bpeIterate(spark, TestSpark.sf, 20).collect()
      .map(m => (m.getString(1), " " + m.getString(2) + " ")).toSeq
    assert(merges.size >= 15)
    val wrapped = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .select(regexp_replace(col("tok"), "(.)", " $1 ").as("s"))
    val viaExpr = wrapped
      .select(SketchExpressions.chainedReplace(col("s"), merges).as("s"))
      .collect().map(_.getString(0)).sorted
    val viaChain = merges.foldLeft(wrapped) { (df, m) =>
        df.withColumn("s", replace(col("s"), lit(m._1), lit(m._2)))
      }.collect().map(_.getString(0)).sorted
    assert(viaExpr === viaChain,
      "merge-table expression must be bit-identical to the chained form")
    // interpreted path replays the same fold
    val prevFac = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val viaInterp =
      try wrapped
        .select(SketchExpressions.chainedReplace(col("s"), merges).as("s"))
        .collect().map(_.getString(0)).sorted
      finally prevFac.fold(
        spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    assert(viaInterp === viaExpr)
    // production merge count: 300 synthetic merges in ONE expression.
    // CODEGEN_ONLY makes a janino compile failure throw instead of
    // silently falling back — the property the chained form loses at
    // real vocabulary sizes (its expression depth grows per merge).
    val big = (0 until 300).map(i => (s" a$i  b$i ", s" a${i}b$i "))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = Seq(" a0  b0  a299  b299  zz ").toDF("s")
        .select(SketchExpressions.chainedReplace(col("s"), big).as("s"))
        .collect()(0).getString(0)
      assert(out === " a0b0  a299b299  zz ")
    } finally prevFac.fold(
      spark.conf.unset("spark.sql.codegen.factoryMode"))(
      spark.conf.set("spark.sql.codegen.factoryMode", _))
  }

  test("NfcNormalize: composes decomposed sequences, identity on ASCII " +
      "and on already-composed text, idempotent, codegen == interpreted") {
    import spark.implicits._
    val decomposed = "Caf" + "e\u0301" + " a\u030A"
    val composed = "Caf\u00E9 \u00E5"
    val ascii = "plain ascii text 123"
    val ohm = "\u212B" // ANGSTROM SIGN
    val rows = Seq(decomposed, composed, ascii, ohm, "")
    def evalAll(): Seq[String] = rows.toDF("s")
      .select(SketchExpressions.nfcNormalize(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val gen = evalAll()
    assert(gen(0) === composed, "decomposed pairs must compose")
    assert(gen(1) === composed, "already-NFC text is a fixpoint")
    assert(gen(2) === ascii, "ASCII fast path is the identity")
    assert(gen(3) === "\u00C5", "singleton canonical composition (UAX #15)")
    assert(gen(4) === "")
    // the expression is not CodegenFallback and survives CODEGEN_ONLY
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal("x"))
      .isInstanceOf[CodegenFallback])
    val prevFac = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try assert(evalAll() === gen)
    finally spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    // interpreted path is the same kernel
    try assert(evalAll() === gen)
    finally prevFac.fold(
      spark.conf.unset("spark.sql.codegen.factoryMode"))(
      spark.conf.set("spark.sql.codegen.factoryMode", _))
    // idempotence over the fixture corpus WITH the planted suffix: a
    // second normalization changes nothing (and null propagates)
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
      .select(concat(col("text"), lit("e\u0301")).as("raw"))
      .select(SketchExpressions.nfcNormalize(col("raw")).as("n1"))
      .select(col("n1"),
        SketchExpressions.nfcNormalize(col("n1")).as("n2"))
    assert(docs.filter(col("n1") =!= col("n2")).count() === 0L)
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(SketchExpressions.nfcNormalize(col("s")).as("n")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("bpe training at production rounds: the Spark JOB COUNT is a " +
      "small constant independent of rounds (one vocab pass + a " +
      "driver-local merge loop), 300 rounds complete, and the merge " +
      "sequence is prefix-stable") {
    import graft.operators.TextAnalysis
    // count the Spark jobs a full training launches: the round-12 claim
    // is ONE distributed pass (the vocab aggregate — a couple of jobs
    // under AQE) and ZERO jobs per merge round. Pre-fix, every round
    // launched a pair-aggregate job + a top-1 collect: 30k sequential
    // jobs of pure scheduler latency at a production merge count.
    def jobsDuring[T](tag: String)(f: => T): (T, Int) = {
      spark.sparkContext.setJobGroup(tag, tag, false)
      val out = try f finally spark.sparkContext.clearJobGroup()
      // the status store is listener-fed: settle until the group's job
      // list stops growing before reading it
      def n(): Int =
        spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
      var last = -1; var cur = n()
      while (cur != last) { Thread.sleep(200); last = cur; cur = n() }
      (out, cur)
    }
    val ((merges60, _), jobs60) = jobsDuring("bpe-jobs-60") {
      TextAnalysis.bpeIterateImpl(spark, TestSpark.sf, rounds = 60)
    }
    val ((merges300, words300), jobs300) = jobsDuring("bpe-jobs-300") {
      TextAnalysis.bpeIterateImpl(spark, TestSpark.sf, rounds = 300)
    }
    assert(jobs300 === jobs60,
      s"job count must not scale with rounds: $jobs60 @60 vs $jobs300 @300")
    assert(jobs300 <= 4,
      s"training must be one distributed pass (got $jobs300 jobs)")
    // the loop genuinely trains: the synthetic corpus holds only 31
    // distinct tokens, so its merge inventory exhausts at ~89 distinct
    // merges — rounds past exhaustion are free driver-side no-ops,
    // exactly what a production trainer sees when a vocab saturates
    val m300 = merges300.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(m300.size >= 80,
      s"the vocab must sustain enough merges (${m300.size})")
    // prefix stability: BPE merges depend only on earlier merges, so a
    // longer training must extend — never rewrite — a shorter one
    val m60 = merges60.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(m300.take(m60.size) === m60,
      "longer training must be an extension of shorter training")
    // and the words seam is driver-local data now — no lineage, no
    // plan-depth question left (the round-10/11 checkpoint cadence
    // this test used to pin is retired with the per-round jobs)
    val planNodes = words300.queryExecution.analyzed
      .collect { case n => n }.size
    assert(planNodes <= 3,
      s"the final words relation must be a local relation ($planNodes)")
  }
}
