package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles WITHOUT value buffering.
  *
  * Spark's exact `percentile` aggregate buffers every input value in its
  * aggregation buffer; the final merge concentrates the whole input (one
  * value per row) into ONE task — at 1e9 documents that is gigabytes of
  * single-task state, the last scale-killer shape this repo's plan lint
  * forbids. This helper computes the SAME bit-exact linear-interpolation
  * percentiles (the formula in Spark's
  * `catalyst.expressions.aggregate.Percentile.getPercentile`: rank
  * `p * (n-1)`, result `(ceil(r)-r)*v[floor(r)] + (r-floor(r))*v[ceil(r)]`
  * with the integral-rank and equal-neighbor early returns) from
  * histogram passes whose state is value-RANGE-bounded, never row-count-
  * bounded:
  *
  *  1. one fixed-width histogram aggregate per group — `(bin, count, min,
  *     max)` rows, bounded by range/binWidth (like k-means' k×dim
  *     centroid metadata, a driver-safe collect independent of corpus
  *     size);
  *  2. driver-side rank location: cumulative bin counts find the bin
  *     holding each needed rank; a rank that falls on a bin's first/last
  *     value (or in a constant bin) is already pinned by that bin's
  *     min/max — no second pass;
  *  3. bins still holding an interior rank with more than `selectCap`
  *     rows are re-binned 256× finer (filtered to the boundary bins
  *     only, so each refinement scans but never buffers); after at most
  *     `maxDepth` rounds any survivor is astronomically skewed and falls
  *     through to step 4 regardless of size;
  *  4. a final row_number select, partitioned per boundary bin
  *     (≤ `selectCap` rows per partition in the non-pathological case),
  *     pulls the exact k-th ascending value of each remaining bin.
  *
  * The interpolation itself runs driver-side in the identical IEEE-754
  * order Spark's `Percentile` uses (`Long - Double` rank arithmetic,
  * `(higher - pos) * vLo + (pos - lower) * vHi`), so results are
  * bit-for-bit what `percentile(col, lit(p))` returns — the DuckDB-oracle
  * hash contract survives the rewrite unchanged.
  *
  * Callers with an expensive input should `persist` it around the call:
  * the helper runs 1 + (0 or more refinement) + (0 or 1 select) jobs over
  * `df`.
  */
object ExactQuantiles {

  private case class Bin(b: Long, cnt: Long, mn: Double, mx: Double)

  /** A pending in-bin rank: the k-th ascending value (0-indexed `local`)
    * of group `g` restricted to the half-open value range [lo, hi). */
  private case class Need(g: String, rank: Long, lo: Double, hi: Double,
      cnt: Long, local: Long)

  /** Exact percentiles of `valueCol` per `groupCol` group.
    *
    * @param binWidth  histogram bin width — MUST be a power of two so
    *                  nested refinements align on exact double boundaries.
    *                  Choose so (value range / binWidth) is a few hundred:
    *                  that is the pass-1 collect size per group.
    * @param selectCap largest bin the final row_number select may sort in
    *                  one partition; bigger bins are re-binned first.
    * @return group -> (row count n, one exact value per percentage) —
    *         bit-identical to `percentile(valueCol, lit(p))` per group.
    */
  def percentiles(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      percentages: Seq[Double],
      binWidth: Double,
      selectCap: Long = 4096L): Map[String, (Long, Seq[Double])] = {
    require(binWidth > 0 && java.lang.Double.doubleToRawLongBits(binWidth)
      .&(0x000fffffffffffffL) == 0L, s"binWidth $binWidth must be a power of two")
    val spark = df.sparkSession
    val base = df.select(groupCol.cast("string").as("g"),
      valueCol.cast("double").as("x")).filter(col("x").isNotNull)

    def histogram(src: DataFrame, width: Double): Map[String, Seq[Bin]] =
      src.groupBy(col("g"), floor(col("x") / lit(width)).cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"), min(col("x")).as("mn"),
          max(col("x")).as("mx"))
        .collect()
        .map(r => (r.getString(0),
          Bin(r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .groupBy(_._1).map { case (g, rows) =>
          g -> rows.map(_._2).sortBy(_.b).toSeq }

    // Walk `bins` (ascending, cumulative) to the bin holding rank `k`;
    // a constant bin or an edge rank is pinned by the bin's min/max.
    def locate(bins: Seq[Bin], k: Long): Either[Double, (Bin, Long)] = {
      var before = 0L
      bins.foreach { bin =>
        if (k < before + bin.cnt) {
          val local = k - before
          return if (bin.mn == bin.mx || local == 0L) Left(bin.mn)
          else if (local == bin.cnt - 1) Left(bin.mx)
          else Right((bin, local))
        }
        before += bin.cnt
      }
      throw new IllegalStateException(s"rank $k beyond input size $before")
    }

    val hist0 = histogram(base, binWidth)
    val nByG = hist0.map { case (g, bins) => g -> bins.map(_.cnt).sum }
    // 0-indexed ranks each group needs: floor and ceil of every position
    val ranksByG = nByG.map { case (g, n) =>
      g -> percentages.flatMap { p =>
        val pos = (n - 1) * p
        Seq(pos.floor.toLong, pos.ceil.toLong)
      }.distinct.sorted
    }

    val resolved = mutable.Map.empty[(String, Long), Double]
    var needs = Vector.empty[Need]
    ranksByG.foreach { case (g, ranks) =>
      ranks.foreach { k =>
        locate(hist0(g), k) match {
          case Left(v) => resolved((g, k)) = v
          case Right((bin, local)) => needs :+= Need(g, k,
            bin.b * binWidth, (bin.b + 1) * binWidth, bin.cnt, local)
        }
      }
    }

    // Refinement: 256x finer bins inside oversized boundary bins only.
    // maxDepth 4 = 2^-32 of binWidth — beyond that bin ids near the
    // double mantissa limit, and a >selectCap bin that narrow is data so
    // degenerate the final select's one sorted partition is acceptable.
    var width = binWidth
    var depth = 0
    while (needs.exists(_.cnt > selectCap) && depth < 4) {
      width /= 256.0
      val (big, small) = needs.partition(_.cnt > selectCap)
      val cond = big.map(nd =>
          col("g") === nd.g && col("x") >= nd.lo && col("x") < nd.hi)
        .reduce(_ || _)
      val hist = histogram(base.filter(cond), width)
      needs = small
      big.foreach { nd =>
        // sub-bins nest exactly (power-of-two widths): a child bin start
        // inside [lo, hi) means the whole child bin is inside
        val sub = hist.getOrElse(nd.g, Nil)
          .filter(b => b.b * width >= nd.lo && b.b * width < nd.hi)
        locate(sub, nd.local) match {
          case Left(v) => resolved((nd.g, nd.rank)) = v
          case Right((bin, local)) => needs :+= Need(nd.g, nd.rank,
            bin.b * width, (bin.b + 1) * width, bin.cnt, local)
        }
      }
      depth += 1
    }

    // Final in-bin rank select: one window PARTITIONED per boundary bin.
    if (needs.nonEmpty) {
      val ranges = needs.map(nd => (nd.g, nd.lo, nd.hi)).distinct.zipWithIndex
      def ridOf(nd: Need): Int = ranges.collectFirst {
        case ((g, lo, hi), i) if g == nd.g && lo == nd.lo && hi == nd.hi => i
      }.get
      val rid = ranges.foldLeft(lit(-1)) { case (acc, ((g, lo, hi), i)) =>
        when(col("g") === g && col("x") >= lo && col("x") < hi, lit(i))
          .otherwise(acc)
      }
      val wantedDf = spark.createDataFrame(
        needs.map(nd => (ridOf(nd), nd.local))).toDF("rid", "rn")
      val w = Window.partitionBy(col("rid")).orderBy(col("x"))
      val got = base.withColumn("rid", rid).filter(col("rid") >= 0)
        .withColumn("rn", (row_number().over(w) - 1).cast("long"))
        .join(broadcast(wantedDf), Seq("rid", "rn"))
        .select(col("rid"), col("rn"), col("x"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
      needs.foreach { nd =>
        resolved((nd.g, nd.rank)) = got((ridOf(nd), nd.local))
      }
    }

    // Spark Percentile.getPercentile, replayed in the same IEEE order.
    nByG.map { case (g, n) =>
      val vals = percentages.map { p =>
        val pos = (n - 1) * p
        val lower = pos.floor.toLong
        val higher = pos.ceil.toLong
        val vLo = resolved((g, lower))
        if (higher == lower) vLo
        else {
          val vHi = resolved((g, higher))
          if (vHi == vLo) vLo
          else (higher - pos) * vLo + (pos - lower) * vHi
        }
      }
      g -> (n, vals)
    }
  }
}
