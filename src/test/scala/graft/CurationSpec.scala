package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Corpus-curation invariants the DuckDB oracle cannot express:
  * determinism across runs, the sample/complement partition property,
  * redaction completeness, and the shuffle-free plan shape that makes
  * hash bucketing the 100 TB answer. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("hash split is deterministic and partitions the corpus") {
    val a = Curation.hashSplit(spark, sf).collect()
    val b = Curation.hashSplit(spark, sf).collect()
    assert(a.sameElements(b)) // identical across runs — no rand()
    val total = Tables.load(spark, sf, "documents").count()
    assert(a.length == total) // every document assigned exactly once
    val bySplit = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 90/5/5 within binomial slack on a small corpus
    assert(bySplit("train").toDouble / total > 0.8)
    assert(bySplit("val") > 0 && bySplit("test") > 0)
  }

  test("sample(p) and its complement partition the corpus exactly") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sf, "documents")
    val in = Curation.hashSample(spark, sf, pct = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = docs
      .filter(Curation.hashBucket(col("doc_id")) >= 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(in.intersect(out).isEmpty)
    assert(in.size + out.size == docs.count())
  }

  test("hash split plans as a narrow scan — no Exchange") {
    val plan = Curation.hashSplit(spark, sf).queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    // the presentation orderBy sorts, but assignment itself never shuffles
    val beforeSort = plan.linesIterator.filterNot(_.contains("Sort"))
    assert(!beforeSort.exists(_.contains("Exchange hashpartitioning")))
  }

  test("redaction leaves no email / phone / ipv4 behind") {
    val rows = Curation.piiRedact(spark, sf).collect()
    val leftovers = rows.filter { r =>
      val red = r.getString(2)
      red.contains("@") ||
        "[0-9]{3}-[0-9]{3}-[0-9]{4}".r.findFirstIn(red).isDefined ||
        "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b".r
          .findFirstIn(red).isDefined
    }
    assert(leftovers.isEmpty)
    // and every row was actually touched (the plant guarantees targets)
    assert(rows.forall(r => r.getString(2).contains("<EMAIL>") &&
      r.getString(2).contains("<PHONE>") && r.getString(2).contains("<IP>")))
  }

  test("corpus mix respects per-source rates monotonically") {
    val mixed = Curation.corpusMix(spark, sf).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val bySuffix = (m: Int) => mixed.collect {
      case (src, n) if src.stripPrefix("src").toInt % 4 == m => n
    }.sum
    // rate 100% keeps everything; each lower tier keeps fewer
    val docs = Tables.load(spark, sf, "documents")
    import org.apache.spark.sql.functions._
    val per = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = per.collect {
      case (src, n) if src.stripPrefix("src").toInt % 4 == 0 => n
    }.sum
    assert(bySuffix(0).toLong == full) // 100% tier intact
    assert(bySuffix(3) <= bySuffix(1)) // 10% tier ≤ 50% tier
  }

  test("curation funnel only shuffles once (the dedup group-by)") {
    val plan = Curation.curateCorpus(spark, sf).queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    val exchanges = plan.linesIterator
      .count(_.trim.startsWith("Exchange hashpartitioning"))
    // digest group-by + final tiny split group-by; no join, no sort-based
    // repartition — rejected docs never reach a shuffle
    assert(exchanges <= 2)
  }

  test("decontamination joins the eval grams as a broadcast, never a sort-merge") {
    val plan = Curation.decontaminate(spark, sf).queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      "eval-gram join must broadcast (the eval side is tiny by definition)")
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge join here would shuffle the full training gram set")
  }

  test("bloom prefilter lane equals exact decontamination bit-for-bit") {
    val exact = Curation.decontaminate(spark, sf).collect()
    val bloom = Curation.bloomDecontaminate(spark, sf).collect()
    assert(bloom.map(_.toString).toSeq == exact.map(_.toString).toSeq)
    // the corpus exercises both branches: planted eval copies confirm,
    // the clean majority must ride the one-row explode_outer path
    val contaminated = bloom.count(_.getBoolean(2))
    assert(contaminated > 0 && contaminated < bloom.length / 2)
  }

  test("bloom lane never explodes clean documents into per-gram rows") {
    // the prefilter's explode_outer must emit one row per clean doc +
    // one per candidate gram — compare its runtime numOutputRows metric
    // against the exact lane's corpus-wide gram explosion
    def generateRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(all)) ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => all(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => all(q.plan)
          case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
            all(r.child)
          case _ => Nil
        })
      all(df.queryExecution.executedPlan).collect {
        case g: org.apache.spark.sql.execution.GenerateExec
            // the training-side explode, not the tiny eval-gram one
            if g.metrics("numOutputRows").value > 100 =>
          g.metrics("numOutputRows").value
      }.sorted.lastOption.getOrElse(0L)
    }
    val exactRows = generateRows(Curation.decontaminate(spark, sf))
    val bloomRows = generateRows(Curation.bloomDecontaminate(spark, sf))
    assert(exactRows > 0 && bloomRows > 0)
    // at fpp=1e-4 only the ~1% truly-contaminated docs (plus rare false
    // flags) explode; everything else rides the one-row path
    assert(bloomRows < exactRows / 4,
      s"prefilter must shrink the aggregate input ($bloomRows vs $exactRows)")
  }

  test("domain balance: water-filling identity, common cap, maximal cut") {
    val rows = Curation.domainBalance(spark, sf).collect()
    val avail = rows.map(_.getLong(1))
    val alloc = rows.map(_.getDouble(2))
    val saturated = rows.map(_.getBoolean(3))
    val keptTok = rows.map(_.getLong(5))
    // allocation never exceeds availability; kept never exceeds alloc
    rows.indices.foreach { i =>
      assert(alloc(i) <= avail(i).toDouble + 1e-6)
      assert(keptTok(i).toDouble <= alloc(i) + 1e-6)
    }
    // water level: sum of allocations hits the budget (t6 slack ×m)
    val total = avail.sum.toDouble
    assert(math.abs(alloc.sum - total * 0.6) < 1e-4 * rows.length,
      s"sum alloc ${alloc.sum} vs budget ${total * 0.6}")
    // every capped source sits at the SAME level; saturated ones keep all
    val caps = rows.indices.filterNot(saturated).map(alloc)
    assert(caps.distinct.length <= 1, s"unequal caps: ${caps.distinct}")
    rows.indices.filter(saturated).foreach { i =>
      assert(alloc(i) == avail(i).toDouble)
    }
    // the cut is maximal: no source could fit its next-largest doc
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val perDoc = Tables.load(spark, sf, "documents")
      .select(col("source"), col("n_chars"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ntok"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val docs = perDoc(r.getString(0))
        .sortBy(x => (-x.getLong(1), x.getLong(2))).map(_.getLong(3))
      val kept = r.getLong(4).toInt
      if (kept < docs.length)
        assert(docs.take(kept + 1).sum.toDouble > r.getDouble(2),
          s"${r.getString(0)} could fit one more doc")
    }
  }

  test("pack stats reconcile with the packed layout; tail-only waste") {
    val packed = Curation.packSequences(spark, sf).collect()
    val stats = Curation.packStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    packed.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val st = stats(src)
      assert(st.getLong(1) === rows.length.toLong)
      val total = rows.map(_.getLong(2)).sum
      assert(st.getLong(2) === total)
      assert(st.getLong(3) === (total + 511) / 512) // ceil division
      val splits = rows.count(r => r.getLong(4) + r.getLong(2) > 512)
      assert(st.getLong(5) === splits.toLong)
      // stream packing wastes only the tail window: fill >= (W-1)/W
      val w = st.getLong(3).toDouble
      assert(st.getDouble(4) >= (w - 1) / w - 1e-6)
    }
  }

  test("k-anonymity groups partition the corpus and flag exactly n < k") {
    val rows = Curation.kAnonymity(spark, sf).collect()
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(3)).sum === total,
      "every document must fall in exactly one quasi-identifier group")
    rows.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(3) < 5))
      assert(r.getLong(2) % 100 === 0, "bucket must align to width")
    }
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "the corpus must exercise both branches")
  }

  test("packing shuffles once, on the source key") {
    val plan = Curation.packSequences(spark, sf).queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size === 1 && hashEx.head.contains("source"),
      s"expected exactly the window's source partition: $hashEx")
  }

  test("chunking covers every token; neighbors overlap by size - stride") {
    import org.apache.spark.sql.functions.col
    val nTok = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = Curation.chunkDocuments(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet === nTok.keySet)
    chunks.foreach { case (doc, rows) =>
      val n = nTok(doc)
      val byIdx = rows.sortBy(_.getInt(1))
      // starts advance by stride; chunk sizes are full except the tail
      byIdx.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) === i)
        val expect = math.min(32L, n - i * 16L)
        assert(r.getInt(2).toLong === expect, s"doc $doc chunk $i")
      }
      // the last chunk start is within the doc; one more would start past
      val last = byIdx.length - 1
      assert(last * 16 < n && (last + 1) * 16 >= n)
    }
  }

  test("temperature mix: rates follow the sqrt law and the sample respects them") {
    val docs = Tables.load(spark, sf, "documents")
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmin = counts.values.min
    val rows = Curation.temperatureMix(spark, sf).collect()
    assert(rows.nonEmpty)
    // every emitted pct matches the closed-form sqrt(nmin/nl) rate
    rows.foreach { r =>
      val want = math.floor(math.sqrt(nmin.toDouble / counts(r.getString(1)))
        * 100.0).toLong
      assert(r.getLong(2) === want, s"rate for ${r.getString(1)}")
    }
    // the corpus is genuinely skewed → the majority language is actually
    // down-sampled (the gate is non-vacuous), the smallest kept in full
    val minLang = counts.minBy(_._2)._1
    val maxLang = counts.maxBy(_._2)._1
    assert(rows.count(_.getString(1) == minLang) === counts(minLang))
    assert(rows.count(_.getString(1) == maxLang) < counts(maxLang))
    // kept fraction per language lands near its rate (md5 buckets are
    // uniform; generous slack at tiny SF)
    counts.foreach { case (lang, n) =>
      val kept = rows.count(_.getString(1) == lang)
      val pct = math.floor(math.sqrt(nmin.toDouble / n) * 100.0) / 100.0
      assert(math.abs(kept.toDouble / n - pct) < 0.25,
        s"$lang kept $kept/$n vs rate $pct")
    }
  }

  test("snapshot diff: closed-form added/removed/changed accounting") {
    val ids = Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val rows = Curation.snapshotDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus("removed") === ids.filter(_ % 17 == 3).toSet)
    assert(byStatus("added") === ids.filter(_ % 29 == 7).map(_ + 2000000L).toSet)
    assert(byStatus("changed") ===
      ids.filter(i => i % 13 == 5 && i % 17 != 3).toSet)
    assert(rows.length ===
      byStatus.values.map(_.size).sum) // nothing slips through unchanged
  }

  test("packing: offsets are in-window and cumulative counts reconstruct") {
    val rows = Curation.packSequences(spark, sf).collect()
    var cum = Map.empty[String, Long]
    // rows arrive ordered (source, doc_id) — replay the running sum
    rows.foreach { r =>
      val (src, n, seq, off) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      val start = cum.getOrElse(src, 0L)
      assert(seq === start / 512, s"seq_id of ${r.getLong(1)}")
      assert(off === start % 512, s"offset of ${r.getLong(1)}")
      cum = cum.updated(src, start + n)
    }
  }

  test("split leakage: flagged groups genuinely span splits; intra-split " +
      "duplicates are not flagged") {
    import org.apache.spark.sql.functions._
    val flagged = Curation.splitLeakage(spark, sf).collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      assert(r.getAs[Long]("n_splits") > 1)
      assert(r.getAs[String]("splits").split(",").length ===
        r.getAs[Long]("n_splits"))
    }
    // first-principles recount: replay the split rule over the planted
    // corpus and check the flagged digest set matches exactly
    val docs = Tables.load(spark, sf, "documents")
    val planted = docs.unionByName(docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L))
    val expect = planted
      .select(md5(col("text")).as("digest"),
        when(Curation.hashBucket(col("doc_id")) < 90, "train")
          .when(Curation.hashBucket(col("doc_id")) < 95, "val")
          .otherwise("test").as("split"))
      .groupBy("digest").agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).collect().map(_.getString(0)).toSet
    assert(flagged.map(_.getAs[String]("digest")).toSet === expect)
  }

  test("semantic leakage: flagged pairs are exactly the planted eval " +
      "copies at self-cosine, nothing natural crosses the threshold") {
    import org.apache.spark.sql.functions._
    val rows = Curation.semanticLeakage(spark, sf).collect()
    val evalIds = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") % 50 === 7)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.nonEmpty, "eval slice must be non-empty at this SF")
    assert(rows.map(_.getLong(1)).toSet === evalIds,
      "every planted eval copy must be recovered (banding guarantees " +
        "identical vectors collide in every band)")
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1) + 1000000L,
        s"natural pair crossed the threshold: ${r.getLong(0)}")
      assert(r.getDouble(2) >= 0.999999, "planted copy must sit at ~1.0")
    }
  }

  test("best-per-lang: full strata, descending quality, true per-lang argmax") {
    import org.apache.spark.sql.functions._
    val rows = Curation.bestPerLang(spark, sf).collect()
    val langs = Tables.load(spark, sf, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet === langs)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val qs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    }
    // the rank-1 doc per lang must carry that lang's maximum quality,
    // recomputed independently via the quality_scores operator
    val best = graft.operators.TextAnalysis.qualityScores(spark, sf)
      .join(Tables.load(spark, sf, "documents").select("doc_id", "lang"),
        Seq("doc_id"))
      .groupBy("lang").agg(max(col("quality")).as("qmax"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.filter(_.getInt(1) == 1).foreach { r =>
      assert(r.getDouble(3) === best(r.getString(0)))
    }
  }

  test("snapshot merge reconstructs v2 exactly") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
    val v2 = docs.filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 5, md5(concat(col("text"), lit(" v2"))))
          .otherwise(md5(col("text"))).as("digest"))
      .unionByName(docs.filter(col("doc_id") % 29 === 7)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          md5(concat(lit("new "), col("text"))).as("digest")))
    val merged = Curation.snapshotMerge(spark, sf)
    assert(merged.exceptAll(v2).isEmpty && v2.exceptAll(merged).isEmpty)
  }

  test("shard assign: every doc in exactly one shard, positions dense " +
      "from 1, assignment deterministic") {
    val a = Curation.shardAssign(spark, sf).collect()
    val b = Curation.shardAssign(spark, sf).collect()
    assert(a.sameElements(b)) // retry-stable: no rand(), no nondeterminism
    val total = Tables.load(spark, sf, "documents").count()
    assert(a.length == total)
    assert(a.map(_.getLong(0)).distinct.length == total)
    val byShard = a.groupBy(_.getLong(1))
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    // in-shard positions are a dense 1..|shard| sequence (the property
    // a sharded export needs to address rows without gaps)
    for ((_, rows) <- byShard)
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length))
  }

  test("stratified sample: exact min(k, |stratum|) rows per stratum, " +
      "deterministic, WindowGroupLimit prunes the rank") {
    import org.apache.spark.sql.functions._
    val k = 5
    val out = Curation.stratifiedSample(spark, sf, k)
    val rows = out.collect()
    assert(rows.sameElements(Curation.stratifiedSample(spark, sf, k).collect()))
    val strata = Tables.load(spark, sf, "documents")
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = rows.groupBy(r => (r.getString(1), r.getString(2)))
    assert(got.keySet === strata.keySet) // every stratum represented
    for ((s0, rs) <- got) {
      assert(rs.length === math.min(k.toLong, strata(s0)).toInt)
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to rs.length))
    }
    // the rank filter must plan as WindowGroupLimit (map-side top-k
    // prune) — the property that keeps a stratum's ordering bounded
    // sparkPlan, not executedPlan: AQE wraps the tree before execution
    val plan = out.queryExecution.sparkPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window
        .WindowGroupLimitExec]),
      "stratified sample must prune via WindowGroupLimit")
  }

  test("token budget: banded cut equals the global greedy cut exactly " +
      "and is maximal against the budget") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    import graft.functions.Num
    val out = Curation.tokenBudget(spark, sf).collect()
    // independent greedy recompute: score every document the
    // quality_logit way, sort globally, run one cumulative sum in Scala
    val z = lit(-1.0) + stopwordRatio(col("text")) * lit(2.0) +
      punctRatio(col("text")) * lit(-4.0) +
      least(tokenCount(col("text")).cast("double") / lit(256.0), lit(1.0)) *
        lit(1.5) +
      least(avgTokenLen(col("text")) / lit(8.0), lit(1.0)) * lit(1.0)
    val scored = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Num.t6(z).as("logit"),
        tokenCount(col("text")).as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, lg, _) => (-lg, id) }
    val budget = scored.map(_._3).sum / 2
    var cum = 0L
    val expected = scored.iterator.map { case (id, lg, nt) =>
      cum += nt; (id, lg, nt, cum)
    }.takeWhile(_._4 <= budget).toSeq
    val gotSorted = out.map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(gotSorted === expected.sortBy(_._1))
    // greedy-maximal: the next document in score order would overflow
    if (expected.length < scored.length)
      assert(expected.lastOption.map(_._4).getOrElse(0L) +
        scored(expected.length)._3 > budget)
  }

  test("rouge recall: planted eval copies reach recall 1.0 against " +
      "their own eval doc; every recall is in (0, 1]") {
    val rows = Curation.rougeRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rec = r.getDouble(3)
      assert(rec > 0.0 && rec <= 1.0)
    }
    val planted = rows.filter(_.getLong(0) >=
      graft.operators.Dedup.PlantOffset)
    assert(planted.nonEmpty, "planted eval copies must surface")
    planted.foreach { r =>
      assert(r.getDouble(3) === 1.0,
        s"planted ${r.getLong(0)} must fully cover its eval doc")
      assert(r.getLong(1) === r.getLong(0) -
        graft.operators.Dedup.PlantOffset)
    }
  }

  test("source datasheet: volumes reconcile with the corpus, dup rate " +
      "bounded, majority language is a real member of its source") {
    import org.apache.spark.sql.functions._
    val rows = Curation.sourceDatasheet(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val langsBySource = docs.groupBy("source")
      .agg(collect_set(col("lang")).as("ls")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(8) <= r.getLong(1), "distinct texts <= docs")
      val dup = r.getDouble(9)
      assert(dup >= 0.0 && dup < 1.0)
      assert(langsBySource(src).contains(r.getString(4)),
        s"$src: top_lang must be one of the source's languages")
      assert(r.getLong(5) <= r.getLong(6), "min_chars <= max_chars")
      assert(r.getDouble(7) >= r.getLong(5).toDouble - 1e-6 &&
        r.getDouble(7) <= r.getLong(6).toDouble + 1e-6)
    }
  }

  test("mix plan: temperature damping holds (shares flatter than raw " +
      "token shares), targets respect the budget, epochs consistent") {
    val rows = Curation.mixPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < rows.length * 1e-6 + 1e-9)
    val toks = rows.map(_.getLong(1))
    val total = toks.sum.toDouble
    // α=0.5 damping: every share sits between the raw token share and
    // the uniform share (sqrt compresses toward uniform, never past it)
    rows.foreach { r =>
      val raw = r.getLong(1) / total
      val uni = 1.0 / rows.length
      val sh = r.getDouble(2)
      val (lo, hi) = (math.min(raw, uni), math.max(raw, uni))
      assert(sh >= lo - 1e-4 && sh <= hi + 1e-4,
        s"${r.getString(0)}: share $sh outside damping band [$lo, $hi]")
      // epochs recompute from the row's own columns
      val eps = graft.functions.Num.t6d(
        r.getLong(3).toDouble / r.getLong(1).toDouble)
      assert(r.getDouble(4) === eps)
    }
    val budget = toks.sum / 2
    assert(rows.map(_.getLong(3)).sum <= budget,
      "floored targets can never exceed the budget")
  }

  test("quantization: codes bounded by ±127, error bound holds everywhere") {
    val rows = Curation.embedQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("err_ok"))
      val codes = r.getAs[String]("codes").split(",").map(_.toInt)
      assert(codes.length === r.getAs[Int]("n_dims"))
      assert(codes.forall(c => c >= -127 && c <= 127))
      // max-abs scaling means some coordinate hits full scale
      assert(codes.exists(c => math.abs(c) === 127))
    }
  }

  test("weighted sample: equals an independent A-Res recompute, and " +
      "the rank prunes via WindowGroupLimit") {
    import org.apache.spark.sql.functions._
    val out = Curation.weightedSample(spark, sf, k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // independent replay: md5 uniform, log-space key, top-5 per lang
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 > 0)
    val expect = docs.map { case (id, lang, w) =>
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(id.toString).substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4294967296.0
      (lang, id, w, math.log(u) / w.toDouble)
    }.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
      xs.sortBy { case (_, id, _, key) => (-key, id) }.take(5).zipWithIndex
        .map { case ((_, id, w, key), i) =>
          (lang, i + 1, id, w, math.floor(key * 1e6) / 1e6)
        }
    }.sortBy(t => (t._1, t._2))
    val got = rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expect)
    // sparkPlan, not executedPlan: AQE wraps the tree before execution
    val plan = out.queryExecution.sparkPlan
    assert(plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.window
      .WindowGroupLimitExec]), "rank filter must prune map-side")
  }

  test("poisson bootstrap: multiplicities replay the inverse CDF, " +
      "replica means bracket the true mean, CI is the order statistic") {
    import org.apache.spark.sql.functions._
    val rows = Curation.poissonBootstrap(spark, sf).collect()
    assert(rows.length === 32)
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent replay of replica 0's multiplicities and mean
    val cum = Seq(1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0, 163.0 / 60.0,
      1957.0 / 720.0).map(_ * math.exp(-1.0))
    def mult(id: Long, b: Int): Int = {
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$id|$b").substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4294967296.0
      cum.indexWhere(u < _) match { case -1 => 7; case i => i }
    }
    val m0 = docs.map { case (id, w) => (mult(id, 0), w) }
    val exp0 = math.floor(m0.map { case (m, w) => m.toLong * w }.sum.toDouble /
      m0.map(_._1.toLong).sum * 1e6) / 1e6
    val r0 = rows.find(_.getInt(0) == 0).get
    assert(r0.getLong(1) === m0.map(_._1.toLong).sum)
    assert(r0.getDouble(2) === exp0)
    // CI = order statistics 2 and 31 of the replica means; the replica
    // spread brackets the plain corpus mean
    val means = rows.map(_.getDouble(2)).sorted
    assert(rows.forall(_.getDouble(3) === means(1)))
    assert(rows.forall(_.getDouble(4) === means(30)))
    val trueMean = docs.map(_._2).sum.toDouble / docs.length
    assert(means.head <= trueMean && trueMean <= means.last,
      s"replica range [${means.head}, ${means.last}] vs $trueMean")
  }

  test("dp release: noise replays the md5-seeded inverse-CDF Laplace " +
      "draw exactly, reconciles into n_noisy, and is calibrated") {
    import org.apache.spark.sql.functions._
    val rows = Curation.dpRelease(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, source, n, noise, noisy) = (r.getString(0),
        r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      // independent draw replay: same md5 prefix, same transform
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$lang|$source").substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4294967296.0
      val expect = math.floor(-1.0 * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5)) * 1e6) / 1e6
      assert(noise === expect, s"$lang/$source noise $noise != $expect")
      assert(noisy === n + noise)
    }
    // Laplace(b=1) calibration: mean |noise| concentrates near b
    val meanAbs = rows.map(r => math.abs(r.getDouble(3))).sum / rows.length
    assert(meanAbs > 0.2 && meanAbs < 3.0, s"mean |noise| $meanAbs")
    // the draw must actually vary across groups (not a constant)
    assert(rows.map(_.getDouble(3)).distinct.length > 1)
  }
}
