package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes `explain("formatted")` output for the headline queries to
  * docs/PLANS.md — the plan-shape audit trail (scan pruning, pushdown,
  * broadcast choices, exchange placement) reviewed after each operator
  * lands. */
object ExplainDump {
  val headline = Seq(
    "q1_pricing", "q5_region", "q3_shipping", "q6_forecast", "q4_priority",
    "mart_daily", "day_slice", "top10_per_day", "join_semi", "sessionize",
    "asof_join", "minhash_pairs", "embed_neardup_pairs", "ann_brute_topk",
    // (no stream_* or dedup_clusters here: building those DFs EXECUTES
    // the stream / the iterative rounds, not just plans them)
    "ann_ivf_topk", "ann_lsh_topk", "ann_lsh_recall", "dedup_candidates",
    "text_stats", "mm_meta", "mm_mp4_meta", "mm_resize", "contract_nulls",
    "repetition_scores", "entropy_scores", "source_quantiles",
    "ann_lsh_recall_gate", "approx_stats_gate", "mm_features",
    "fingerprints", "join_anti", "set_except",
    "decontaminate", "pack_sequences", "chunk_documents", "label_centroids",
    "q2_min_cost", "q9_profit", "q11_important_stock", "q16_supplier_cnt",
    "q17_small_qty", "q20_promotable", "q21_waiting", "q22_opportunity",
    "unigram_logprob", "quality_logit", "kmeans_assign", "temperature_mix",
    "search_docs",
    // round 6: span-dedup family, winnowing, deciles, shard export,
    // batch-vs-index dedup (stream_index_dedup excluded: runs a stream)
    "dup_spans", "span_scrub", "winnow_fingerprints", "ppl_buckets",
    "shard_assign", "incremental_dedup", "semdedup_planted",
    "dsir_weights", "hard_negatives", "bpe_merges", "range_join_binned",
    "contract_unique", "contract_refint",
    // round 7: the trainable quality step (bpe_iterate/ann_ivf_indexed
    // excluded: building those DFs EXECUTES the training rounds)
    "quality_train",
    // round 7 session 2 (doremi_step excluded: collects the domain
    // table while building; stream_neardup excluded: runs a stream)
    "stratified_sample", "token_budget", "rouge_recall", "edit_verify",
    "quality_calibration", "source_datasheet", "minhash_est_gate",
    "zorder_stats", "skew_audit",
    // round 8 (index-building lifecycles excluded: ann_ivfpq_indexed /
    // ann_ivf_compact / bpe_coverage execute while building; the
    // centroid/codebook collects of the included ones are the
    // kmeans_assign precedent)
    "random_projection", "ann_rp_planted", "lang_confusion",
    "source_similarity", "pack_stats", "k_anonymity",
    "ann_ivfpq_topk", "compaction_plan", "mm_phash_dedup",
    "quality_psi", "zipf_fit", "dedup_cross_source", "embed_power_iter",
    "scd2_history", "dp_release", "weighted_sample", "poisson_bootstrap",
    "hll_merge_gate", "ab_test",
    // round 9: both new queries (ann_ivf_batch, layout_skipping_gate)
    // are scratch-write lifecycles — building their DFs executes the
    // index/copy writes, so they follow the ann_ivf_compact exclusion;
    // the batch-probe plan shape (BHJ + dynamicpruning) is pinned in
    // SimilaritySpec instead
    // round 10: the pixel/sample decode lanes plus the batch-lane gates
    // (ann_lsh_batch/ann_rp_batch run the two lanes to compare them —
    // the lanes' own plans are pinned in SimilaritySpec; ann_lsh_indexed
    // is a scratch-write lifecycle, excluded like ann_ivf_compact)
    "mm_audio_features", "mm_features_md5", "mm_resize_md5",
    // round-10 session 2: NFC audit (pure narrow scan + hash aggregate)
    // and embedding decontamination (banded candidates + broadcast eval
    // joins); file_compaction_gate is a scratch-write lifecycle,
    // excluded like ann_ivf_compact
    "text_nfc", "semantic_leakage",
    // round 11: the adaptive-k SemDeDup (bounded centroid collect —
    // the kmeans_assign precedent) and the codec decode lanes (pure
    // mapPartitions over the typed fixture map, like mm_features)
    "semdedup_adaptive", "mm_features_png", "mm_resize_png",
    "mm_jpeg_gate")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val sb = new StringBuilder
    sb.append("# Physical plans (explain formatted), headline queries\n\n")
    sb.append(s"Generated against `$dir` by `graft.tools.ExplainDump`.\n")
    headline.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get("docs/PLANS.md"), sb.toString)
    println(s"[explain] wrote docs/PLANS.md (${headline.size} plans)")
    spark.stop()
  }
}
