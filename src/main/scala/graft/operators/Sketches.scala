package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num
import graft.functions.TextFunctions.tokens

/** Approximate aggregates — the sketches that make 100 TB interactive:
  * HyperLogLog++ distinct counts and quantile summaries compute in one
  * pass with tiny, mergeable state (shuffle carries sketch bytes, not
  * values). Results are deterministic for a given input (HLL merge is
  * commutative), but not ANSI-SQL-reproducible => rows-only gate +
  * tolerance tests against the exact answers. */
object Sketches {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-type approximate distinct users + quantiles of value, alongside
    * group counts. approx_count_distinct rsd=0.01; percentile_approx with
    * 10k accuracy — deliberate: accuracy is the KLL/GK compression
    * parameter (error ~ 1/accuracy in rank space), 10k keeps the p95
    * within the tolerance the ApproxSpec test pins while the sketch stays
    * a few hundred KB of mergeable state per group. Both quantiles come
    * from ONE sketch (array percentiles), not one sketch per quantile. */
  def approxStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.95)),
          lit(10000)).as("pcts"))
      .select(col("event_type"), col("n"), col("approx_users"),
        col("pcts").getItem(0).as("p50"), col("pcts").getItem(1).as("p95"))
      .orderBy("event_type")

  /** Value-checked sketch-accuracy gate: per event type, the HLL++
    * distinct-user estimate must sit within 10% of the exact count
    * (rsd=0.01, so 10% is a >5-sigma envelope — and the sketch hash is
    * seedless, making the estimate DETERMINISTIC for a fixed corpus), and
    * the one-sketch quantile pair must be ordered. Constant-TRUE relation
    * the driver hash-matches; the raw estimates stay observable via
    * `approx_stats`. */
  def approxStatsGate(s: SparkSession, dir: String): DataFrame = {
    val exact = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    approxStats(s, dir)
      .join(exact, Seq("event_type"))
      .select(col("event_type"),
        (abs(col("approx_users") - col("exact_users"))
          / col("exact_users") <= 0.1).as("users_ok"),
        (col("p50") <= col("p95")).as("pcts_ordered"))
      .orderBy("event_type")
  }

  /** Skew-handling pattern: salted join. The big side scatters each row
    * of a hot key across `salts` sub-keys; the small side replicates each
    * row to all salts. No single reducer receives a whole hot key. (AQE
    * skew-join splits oversized partitions automatically; explicit
    * salting is the portable form — needed when AQE can't see the skew,
    * e.g. pre-shuffle bucketing or non-AQE engines.)
    *
    * Aggregation-side skew needs no salting in Spark: map-side partial
    * aggregation already collapses hot keys before the shuffle. */
  /** HLL sketch MERGEABILITY gate — the property that makes sketches
    * distributed-correct at all (a 1000-executor count-distinct works
    * because per-partition sketches union into exactly the sketch of
    * the whole; without it, approximate aggregation would not compose):
    * sketch the even-doc_id half and the odd half separately
    * (Datasketches HLL via Spark's native `hll_sketch_agg`), union the
    * two binary sketches (`hll_union`), and compare the merged estimate
    * to sketching the whole corpus in one pass. HLL register merge is a
    * per-register max, so the merged registers are IDENTICAL to the
    * whole-corpus registers and the estimates must agree exactly —
    * `merge_consistent` is closed-form TRUE, and `within_bound` checks
    * the estimate against the exact distinct count at HLL's error bound
    * (lgK=12 ⇒ ~1.6% σ; 5% is > 3σ). Only the booleans and the exact
    * count are emitted — the driver's oracle cannot replay Datasketches
    * internals, and doesn't need to: a broken union or estimator flips
    * a boolean and fails the hash. */
  def hllMergeGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"),
        (col("doc_id") % 2 === 0).as("even"))
    val halves = docs.groupBy(col("even"))
      .agg(hll_sketch_agg(col("term"), lit(12)).as("sk"))
    val merged = halves.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
    // Both lanes go through hll_union_agg so the SAME estimator path
    // (the union's composite estimator) produces both doubles — a
    // direct hll_sketch_agg estimate can be the HIP estimator while a
    // union result is the composite one, and that asymmetry would let
    // merge_consistent flip on a legitimate partition layout.
    val whole = docs.agg(
        hll_sketch_agg(col("term"), lit(12)).as("sk"),
        countDistinct(col("term")).as("n_exact"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_whole"),
        first(col("n_exact")).as("n_exact"))
    whole.crossJoin(merged)
      .select(col("n_exact"),
        (col("est_whole") === col("est_merged")).as("merge_consistent"),
        (abs(col("est_whole") - col("n_exact").cast("double"))
          / col("n_exact").cast("double") < 0.05).as("within_bound"))
  }

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8, forceShuffle: Boolean = false): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedSmall0 = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    // forceShuffle pins a sort-merge join (the skew DEMO needs the
    // shuffle lane: a broadcast join has no reduce-side partitions to
    // skew, and at real scale the dim side is past the broadcast
    // threshold — which is exactly when salting is the only fix)
    val saltedSmall =
      if (forceShuffle) saltedSmall0.hint("merge") else saltedSmall0
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Planted-skew fact relation: 60% of event rows land on key 0, the
    * rest spread over 96 cold keys — deterministic at every SF
    * (event_id arithmetic, the planted-oracle discipline), which is what
    * a zipfian production key looks like to a shuffle. This is the
    * relation [[graft.operators.Layout.skewAudit]]'s diagnostic flags:
    * top-key share ≈ 0.6 ≫ uniform share 1/97. */
  private[graft] def skewedFacts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      when(col("event_id") % 10 < 6, 0L)
        .otherwise(pmod(col("event_id"), lit(97L))).as("k"),
      col("value"))

  /** The cold-key dimension the skewed facts join against (97 rows,
    * grouped into 7 reporting buckets). Derived from `range` so the
    * DuckDB oracle reproduces it exactly. */
  private[graft] def skewKeyDim(s: SparkSession): DataFrame =
    s.range(0L, 97L).toDF("k")
      .select(col("k"), pmod(col("k"), lit(7L)).as("grp"))

  /** End-to-end proof of the skew DECISION ([[Layout.skewAudit]]
    * diagnoses → salting fixes): the planted 60%-hot-key facts joined to
    * the key dim through [[saltedJoin]] on the FORCED shuffle lane, then
    * aggregated per reporting bucket. Unsalted, reducer
    * hash(0) % nPartitions receives ≥ 60% of the fact table — the
    * straggler that caps a 1000-executor cluster at one task's speed;
    * salted, no reducer sees more than one salt's slice of the hot key.
    * SkewJoinSpec measures BOTH lanes' per-task shuffle-read row counts
    * with AQE skew handling OFF and asserts the spread bound — the
    * metric, not the intent. Results are salt-invariant (the oracle is
    * the plain join), which is the whole point: salting is a physical
    * rewrite, never a semantic one.
    *
    * When to reach for WHICH fix at 100×: AQE's `OptimizeSkewedJoin` is
    * the first line of defense — it splits oversized join partitions at
    * runtime with zero code change (SkewJoinSpec pins it firing on this
    * exact planted fixture). Manual salting still wins when AQE cannot
    * apply: an aggregation or window keyed on the hot column (no join
    * to split — pre-aggregate on (key, salt) first), a skewed join
    * whose output partitioning a downstream stage requires (the
    * splitter declines rather than break the distribution), engines or
    * lanes without AQE, and streaming stateful ops where partition
    * sizes are fixed by the state store layout. Broadcast beats both
    * whenever the dim side fits — skew only exists on shuffle lanes. */
  def skewJoinFixed(s: SparkSession, dir: String,
      salts: Int = 8): DataFrame =
    saltedJoin(skewedFacts(s, dir), skewKeyDim(s), "k",
      salts, forceShuffle = true)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), Relational.dsum(col("value")).as("sum_value"))
      .orderBy("grp")

  /** The unsalted shuffle-join lane of [[skewJoinFixed]] — the straggler
    * baseline the spec measures against (same join, same forced
    * sort-merge lane, no salt). Not a contract query: it computes the
    * same relation, it just computes it badly. */
  def skewJoinBaseline(s: SparkSession, dir: String): DataFrame =
    skewJoinBaselineOn(skewedFacts(s, dir), skewKeyDim(s))

  /** The baseline join/aggregate over a caller-supplied facts relation —
    * lets the AQE-split spec feed a MULTI-MAPPER facts input
    * (`repartition(n)`): AQE can only split a skewed reduce partition
    * along map-task boundaries, so the single-row-group local fixture
    * file (one mapper) is structurally unsplittable — a local artifact;
    * a 100 TB fact table always has thousands of mappers. */
  private[graft] def skewJoinBaselineOn(facts: DataFrame,
      dim: DataFrame): DataFrame =
    facts.join(dim.hint("merge"), Seq("k"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), Relational.dsum(col("value")).as("sum_value"))
      .orderBy("grp")

  // ---- count-min sketch (heavy hitters) ----

  /** Exploded word bigrams of the corpus — the stream the CMS summarizes. */
  private def bigramStream(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i),
          element_at(col("w"), i + 1)))).as("gram"))

  /** Exact corpus-wide top-k bigram counts (ties by gram) — the ground
    * truth [[cmsHeavyHittersGate]] compares against, and the exact
    * heavy-hitters query in its own right. One explode + one hash
    * aggregate; the rank window runs on the |bigram-vocab|-sized result. */
  def topNgrams(s: SparkSession, dir: String, k: Int = 25): DataFrame =
    bigramStream(s, dir)
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("gram"))))
      .filter(col("rnk") <= k)
      .select(col("rnk").cast("int").as("rnk"), col("gram"), col("n"))
      .orderBy("rnk")

  /** Count-min sketch as a RELATION: d hash rows × w buckets, stored as
    * (seed, bucket, cnt). Point estimate = min over the d (seed, bucket)
    * counters. This is the natural distributed CMS — building it is one
    * explode(d) + one hash aggregate (map-side combined, the shuffle
    * carries at most d·w counter partials regardless of corpus size), and
    * merging sketches of two corpora is `union → groupBy → sum`. d·w rows
    * (4096 here) broadcast back for point lookups. */
  def cmsTable(grams: DataFrame, w: Int = 1024, d: Int = 4): DataFrame =
    grams
      .select(posexplode(array((0 until d).map(seed =>
        pmod(xxhash64(lit(seed), col("gram")), lit(w.toLong))): _*))
        .as(Seq("seed", "bucket")))
      .groupBy(col("seed"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Value-checked CMS accuracy gate over the exact top-k bigrams: the
    * count-min estimate (min over d counters) must dominate the true
    * count (structural: counters only over-count) and sit within the
    * classic ε·N envelope, ε = e/w (Cormode–Muthukrishnan; holds w.p.
    * ≥ 1−(1/2)^d per query — deterministic here for a fixed corpus, so
    * it either holds or the sketch is mis-built). Constant-TRUE relation
    * keyed by the exact top-k grams, which the oracle reproduces in SQL. */
  def cmsHeavyHittersGate(s: SparkSession, dir: String,
      w: Int = 1024, d: Int = 4, k: Int = 25): DataFrame = {
    val grams = bigramStream(s, dir)
    val cms = cmsTable(grams, w, d)
    val total = grams.agg(count(lit(1)).as("n_total"))
    val top = topNgrams(s, dir, k)
    val probes = top
      .select(col("gram"), col("n"),
        posexplode(array((0 until d).map(seed =>
          pmod(xxhash64(lit(seed), col("gram")), lit(w.toLong))): _*))
          .as(Seq("seed", "bucket")))
      .join(broadcast(cms), Seq("seed", "bucket"))
      .groupBy(col("gram"), col("n"))
      .agg(min(col("cnt")).as("est"))
    probes.crossJoin(broadcast(total))
      .select(col("gram"),
        (col("est") >= col("n")).as("dominates"),
        (col("est") <= col("n")
          + ceil(lit(math.E) * col("n_total") / w)).as("within_eps"))
      .orderBy("gram")
  }

  /** Demo query: events (5 hot event_type keys over the whole table —
    * genuinely skewed) salted-joined to a tiny type-code dim, then
    * aggregated. Must equal the plain join (oracle + test). */
  def saltedJoinDemo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Seq(("click", 1), ("error", 2), ("purchase", 3),
      ("signup", 4), ("view", 5)).toDF("event_type", "type_code")
    saltedJoin(t(s, dir, "events"), dim, "event_type")
      .groupBy(col("type_code"))
      .agg(count(lit(1)).as("n"),
        Relational.dsum(col("value")).as("sum_value"))
      .orderBy("type_code")
  }
}
