package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANSI-mode dual gate. Spark 4 defaults `spark.sql.ansi.enabled=true`;
  * the reference's lenient-parse semantics (Polars `strict=False` —
  * parse failures become nulls) are reproduced with `try_*` functions
  * (`try_to_timestamp` in the ingest path), NOT by running the engine
  * in legacy non-ANSI mode. This suite pins that design: every query
  * in the relational/TPC-H/scalar/ingest subset returns IDENTICAL rows
  * with ANSI on and off, so the contract does not silently depend on
  * lenient-mode arithmetic (overflow-to-null, bad-cast-to-null) that
  * Spark 4 removed from the default — the forward-compat risk named in
  * the round-8 review. `lenientOnly` is the explicit allowlist of
  * queries that genuinely need non-ANSI mode; it is EMPTY, and a query
  * that starts needing it must be added here consciously. */
class AnsiModeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Queries that only run in non-ANSI (lenient) mode. Empty by design:
    * lenient parses go through try_* functions instead. */
  private val lenientOnly: Set[String] = Set.empty

  private val subset: Seq[String] = Seq(
    // TPC-H-shaped analytics (join trees, aggregates, subqueries)
    "q1_pricing", "q2_min_cost", "q3_shipping", "q4_priority",
    "q5_region", "q6_forecast", "q7_volume", "q8_mktshare", "q9_profit",
    "q10_returns", "q11_important_stock", "q12_late", "custdist",
    "q14_promo", "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty",
    "q18_large_orders", "q19_disjunct", "q20_promotable", "q21_waiting",
    "q22_opportunity",
    // scalar/cast/date surface (where ANSI semantics actually bite)
    "scalar_funcs", "scalar_math", "date_arith", "null_funcs",
    "regex_funcs", "case_buckets", "props_json", "listagg_types",
    // relational core
    "row_count", "limit5", "top5_days", "top10_per_day", "multi_sort",
    "having_big_cust", "above_avg", "distinct_agg", "union_all",
    "join_left", "join_semi", "join_anti", "join_full",
    "set_union", "set_intersect", "set_except",
    "win_rank", "win_lag", "win_running", "win_frames",
    // the lenient-parse ingest lineage itself (try_to_timestamp path)
    "stg_hourly", "mart_daily", "batch_day", "day_slice",
    "weather_fixture_daily",
    // LLM-family spot checks: hashing/banding, text stats with integer
    // ratio arithmetic, vector folds, BM25 log terms — the families
    // where an ANSI overflow/cast change would bite differently than
    // in the relational core
    "dedup_exact", "minhash_est_gate", "fingerprints", "text_stats",
    "quality_scores", "embed_norms", "bm25_search", "token_histogram",
    "hash_split", "lang_id",
    // round-10 additions: NFC planted-suffix concat/length arithmetic
    "text_nfc")

  private def withAnsi[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", on.toString)
    try f
    finally prev.fold(spark.conf.unset("spark.sql.ansi.enabled"))(
      spark.conf.set("spark.sql.ansi.enabled", _))
  }

  test("relational/TPC-H/scalar/ingest contract subset is ANSI-mode " +
      "invariant (identical rows on and off; lenientOnly allowlist " +
      "is empty)") {
    subset.filterNot(lenientOnly).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        fail(s"$name missing from SparkEntry.queries"))
      val on = withAnsi(true)(fn(spark, TestSpark.sf).collect().toSeq)
      val off = withAnsi(false)(fn(spark, TestSpark.sf).collect().toSeq)
      assert(on === off, s"$name differs between ANSI on and off")
      assert(on.nonEmpty, s"$name returned no rows")
    }
  }
}
