package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Deequ-style column profiling: one pass over a table producing, per
  * column, its null count, exact distinct count, and typed min/max — the
  * data-quality summary a pipeline computes before trusting a new corpus
  * drop (SURVEY.md §5: the reference's dbt `not_null` test is the 1-column
  * special case of this).
  *
  * Shape: two scans, both cheap. (1) Every non-distinct aggregate (null
  * counts, typed min/max) runs in ONE `agg`, and the 1-row wide result is
  * unpivoted with `stack` into one row per column. (2) The exact distinct
  * counts unpivot FIRST — `posexplode` to narrow (col_idx,
  * xxhash64(value)) pairs — then one map-side-collapsing `distinct` and a
  * per-column count. NOT the obvious 16-fold `countDistinct` in the same
  * agg: that plans through Expand with a 17-column null-padded grouping
  * key (measured 23-25 s on sf0.1 lineitem, half the whole bench);
  * the narrow-pair form is the same exact answer at ~8x less (~3 s).
  * Distinct-of-hash equals distinct-of-value up to 64-bit collisions
  * (P ≈ n²/2⁶⁵ ≈ 1e-7 at 600k values — the fingerprint-equality standard
  * the dedup family already rests on), and the DuckDB oracle counts raw
  * values exactly, so a collision would surface as a gate mismatch, not
  * pass silently. At 100 TB the next knob is `approx_count_distinct`
  * (the `Sketches` HLL path) per column when ±2% is acceptable;
  * everything else is partial-aggregatable min/max/count.
  *
  * Numeric and timestamp min/max surface as doubles (timestamps as epoch
  * seconds — engine-exact for whole-second data); string min/max surface
  * as strings. Doubles are never string-formatted (Spark and SQL engines
  * disagree on double→string rendering, not on the doubles themselves).
  */
object Profile {

  def columnProfile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    def isNumeric(dt: DataType) = dt.isInstanceOf[NumericType]
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val (minNum, maxNum) = f.dataType match {
        case dt if isNumeric(dt) =>
          (min(c).cast("double"), max(c).cast("double"))
        // parquet timestamps without tz surface as NTZ; route through the
        // session-UTC instant so epoch seconds match the oracle's epoch()
        case TimestampType | TimestampNTZType =>
          (min(c).cast("timestamp").cast("double"),
            max(c).cast("timestamp").cast("double"))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minStr, maxStr) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      Seq(
        (count(lit(1)) - count(c)).as(s"nn_${f.name}"),
        minNum.as(s"mn_${f.name}"), maxNum.as(s"mx_${f.name}"),
        minStr.as(s"ms_${f.name}"), maxStr.as(s"xs_${f.name}"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = fields.map(f =>
      s"'${f.name}', nn_${f.name}, " +
        s"mn_${f.name}, mx_${f.name}, ms_${f.name}, xs_${f.name}")
      .mkString(", ")
    val stacked = row.select(col("n_rows"), expr(
      s"stack(${fields.length}, $stackArgs) AS " +
        "(col_name, n_nulls, min_num, max_num, min_str, max_str)"))
    // exact distincts: narrow (col_idx, value-hash) pairs -> one distinct.
    // Cardinality bound for the hash-distinct: counting distinct 64-bit
    // xxhash64 values instead of distinct raw values is collision-exact
    // only while n^2 / 2^65 stays negligible — P(any collision) ~ 2.7e-7
    // at n = 1e6 distinct values per column, ~2.7e-3 at n = 1e8, and
    // likely beyond n ~ 6e9 (the birthday bound). At 100 TB, columns with
    // >1e8 distinct values should flip to approx_count_distinct (HLL,
    // ±2% default) — at that cardinality an "exact" count is a dashboard
    // number anyway, and HLL's partial-merge aggregate shuffles sketch
    // bytes instead of one row per distinct value. Below that bound this
    // form is preferred: hashing keeps the exploded pair narrow (16
    // bytes) no matter how wide the source column is.
    // count(DISTINCT h) rather than a manual distinct()+count: for a
    // single distinct aggregate Spark plans the SAME two-phase shape
    // (partial (ci,h) groups, then a count per ci — no Expand), and the
    // distinct-Count form is what the flag-gated ApproxRewrite rule
    // recognizes, so `spark.graft.approxCountDistinct=true` flips this
    // exact path to HLL++ per column (the documented >1e8-distinct
    // escape hatch) with no code change and no effect on default
    // sessions (spec-pinned both ways in ApproxRewriteSpec).
    val names = typedlit(fields.map(_.name))
    val nd = df
      .select(posexplode(array(fields.map(f =>
        when(col(f.name).isNotNull, xxhash64(col(f.name)))): _*))
        .as(Seq("ci", "h")))
      .filter(col("h").isNotNull)
      .groupBy(col("ci"))
      .agg(count_distinct(col("h")).as("n_distinct"))
      .select(element_at(names, col("ci") + 1).as("col_name"),
        col("n_distinct"))
    stacked.join(broadcast(nd), Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .orderBy("col_name")
  }

  /** Contract query: the profile of the widest mixed-type table. */
  def profileLineitem(s: SparkSession, dir: String): DataFrame =
    columnProfile(Tables.load(s, dir, "lineitem"))
}
