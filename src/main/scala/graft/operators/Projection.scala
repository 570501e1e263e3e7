package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num

/** Johnson–Lindenstrauss random sign projection of the embedding column
  * (Achlioptas '03 database-friendly projections: entries ±1/√k instead
  * of Gaussians), plus the projected-space ANN lane it enables.
  *
  * Why an engine capability: at 100 TB the embedding table's width IS
  * the cost — a 64-dim float vector is 256 bytes/row that every
  * similarity scan reads and every shuffle ships. A 16-dim projection
  * preserves pairwise geometry within JL distortion while cutting
  * per-row bytes 2× and per-distance FLOPs 4×, so candidate generation
  * runs on the narrow projected table and only the candidate set ever
  * touches the wide original column ([[rpTopKOn]] hydrates full vectors
  * for q×cand rows, never the corpus — the `searchDocs` discipline).
  *
  * Determinism without coordination: the sign matrix is a pure function
  * of (j, i) through a splitmix64 mix — no RNG state, no broadcast of a
  * sampled matrix, identical on every executor, every run, and inside
  * the generated DuckDB oracle (the [[graft.operators.Layout.zValue]]
  * pattern: ONE Scala loop emits both the Spark `Column` tree and the
  * oracle's SQL, so the left-to-right double folds agree bit-for-bit).
  * The projection itself is a narrow, shuffle-free, codegen'd map — the
  * shape that parallelizes embarrassingly on 1000 executors.
  */
object Projection {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Input embedding dimensionality (the corpus contract). */
  val Dim = 64

  /** Projected dimensionality. 16 keeps the 1/√k scale factor exactly
    * representable (0.25), so the scaled components are bit-identical
    * across engines with no decimal truncation before the final t6. */
  val OutDim = 16

  /** ±1 sign for output dim `j`, input dim `i`: splitmix64 finalizer of
    * the flat index. Pure driver arithmetic — replayed identically by
    * the oracle generator, never shipped as data. */
  def sign(j: Int, i: Int): Int = {
    var z = j.toLong * Dim + i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1 else -1
  }

  private def e(i: Int): Column =
    element_at(col("embedding"), i + 1).cast("double")

  /** The flattened sign matrix, built once so every [[SignProject]]
    * instance shares the same array reference (expression equality →
    * codegen subexpression elimination dedupes repeated uses). */
  private lazy val signBytes: Array[Byte] =
    Array.tabulate(OutDim * Dim)(x => sign(x / Dim, x % Dim).toByte)

  /** All 16 projected components as ONE codegen'd loop expression —
    * bit-identical to the unrolled (±e₁ ±e₂ …)·0.25 Column trees the
    * oracle SQL states (same IEEE add order), but without the k×d-node
    * tree whose janino compilation cost ~3 s of fixed overhead in every
    * plan that touched the projection. */
  def rpArray: Column = rpArrayOf(col("embedding"))

  /** The same projection applied to an ARBITRARY vector column — the
    * query side of the batch lane projects `q_emb` with the identical
    * sign matrix (same shared array reference, so codegen still
    * dedupes repeated uses). */
  def rpArrayOf(c: Column): Column = graft.functions.SketchExpressions
    .signProject(c, signBytes, OutDim, 0.25)

  /** Projected component j (1-based element of [[rpArray]]). */
  def projComponent(j: Int): Column = element_at(rpArray, j + 1)

  private def projComponentSql(j: Int): String = {
    val terms = (0 until Dim).map { i =>
      val c = s"CAST(embedding[${i + 1}] AS DOUBLE)"
      if (sign(j, i) > 0) s"($c)" else s"(-$c)"
    }
    s"(${terms.mkString(" + ")}) * 0.25"
  }

  private def normInCol: Column =
    sqrt((0 until Dim).map(i => e(i) * e(i)).reduce(_ + _))

  private def normInSql: String = {
    val terms = (0 until Dim).map { i =>
      val c = s"CAST(embedding[${i + 1}] AS DOUBLE)"
      s"($c * $c)"
    }
    s"sqrt(${terms.mkString(" + ")})"
  }

  private def d(j: Int): String = f"d$j%02d"

  /** The per-vector projection report: 16 t6-truncated projected
    * components plus the JL norm-preservation ratio ‖proj‖/‖x‖ (its
    * concentration near 1 is the whole JL guarantee — the spec pins the
    * corpus mean). One narrow scan, zero shuffles before the
    * presentation sort; precondition (shared with every cosine lane
    * here): no all-zero vectors, or the ratio divides by zero. */
  def randomProjection(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings").select(
      col("vec_id") +:
        (0 until OutDim).map(j => projComponent(j).as(d(j))) :+
        normInCol.as("norm_in"): _*)
    val normOut =
      sqrt((0 until OutDim).map(j => col(d(j)) * col(d(j))).reduce(_ + _))
    base.select(
      col("vec_id") +:
        (0 until OutDim).map(j => Num.t6(col(d(j))).as(f"p$j%02d")) :+
        Num.t6(normOut / col("norm_in")).as("norm_ratio"): _*)
      .orderBy("vec_id")
  }

  /** DuckDB mirror of [[randomProjection]], generated by the same loops
    * (same sign matrix, same fold order, same t6 floors). */
  def randomProjectionOracleSql: String = {
    val dCols = (0 until OutDim)
      .map(j => s"${projComponentSql(j)} AS ${d(j)}")
    val pCols = (0 until OutDim).map(j =>
      s"floor(${d(j)} * 1000000.0) / 1000000.0 AS p${d(j).drop(1)}")
    val sumSq = (0 until OutDim).map(j => s"(${d(j)} * ${d(j)})")
      .mkString(" + ")
    s"""WITH b AS (SELECT vec_id, ${dCols.mkString(", ")},
       | $normInSql AS norm_in FROM embeddings)
       | SELECT vec_id, ${pCols.mkString(", ")},
       |  floor((sqrt($sumSq) / norm_in) * 1000000.0) / 1000000.0
       |   AS norm_ratio
       | FROM b ORDER BY vec_id""".stripMargin.replace("\n", "")
  }

  /** (vec_id, rp) — the narrow projected table candidate generation
    * scans instead of the wide original. In production this is what a
    * vector index stores (written once at ingest; 128 B/row of doubles
    * vs 256 B of floats, and 4× fewer FLOPs per distance). */
  private def withRp(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), rpArray.as("rp"))

  /** RP-prefiltered top-k: rank ALL vectors by projected-space cosine
    * (cheap, narrow), keep `cand` per query, exact-rerank only those in
    * the original space. An exact duplicate projects identically
    * (rp_sim = 1.0), so it always survives the candidate cut — what
    * makes the planted gate closed-form. Window ranks run on
    * t6-truncated scores with vec_id tie-breaks (the filteredTopK
    * discipline: a sub-1e-6 ulp can never flip an order). */
  def rpTopKOn(emb: DataFrame, queryIds: Seq[Long], k: Int = 10,
      cand: Int = 200): DataFrame = {
    val proj = withRp(emb)
    val queries = proj.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("rp").as("q_rp"))
    val wc = Window.partitionBy(col("q_id"))
      .orderBy(col("rp_sim").desc, col("vec_id"))
    val candidates = proj.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.t6(Similarity.cosine(col("rp"), col("q_rp"))).as("rp_sim"))
      .withColumn("rc", row_number().over(wc))
      .filter(col("rc") <= cand)
      .select(col("q_id"), col("vec_id"))
    // hydrate the wide embedding column for the q×cand candidate rows
    // only — the corpus-wide scan above never reads it
    val qFull = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    broadcast(candidates)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qFull), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.t6(Similarity.cosine(col("embedding"), col("q_emb")))
          .as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("q_id", "rn")
  }

  def rpTopK(s: SparkSession, dir: String, queryIds: Seq[Long],
      k: Int = 10, cand: Int = 200): DataFrame =
    rpTopKOn(t(s, dir, "embeddings"), queryIds, k, cand)

  /** Query-RELATION RP lane — [[rpTopKOn]] with the queries arriving as
    * a DataFrame `(q_id, q_emb)` (round-9 verdict item 2's lane
    * symmetry, completing LSH + IVF + IVF-PQ + RP): query vectors are
    * projected DISTRIBUTIVELY by [[rpArrayOf]] (same sign matrix, same
    * fold order as the corpus side, so rp_sim of an exact copy is still
    * exactly 1.0), candidate generation scans only the narrow projected
    * table, and nothing query-sized touches the driver. The
    * candidate-cut and rerank windows are identical to the Seq lane's,
    * so corpus-member queries get bit-identical rows — value-pinned by
    * `ann_rp_batch`'s `agrees_seq_lane` column. RP remains a
    * rank-all-vectors lane (its candidate step is a corpus×query scan,
    * cheap only because rows are OutDim doubles); the bucketed lanes
    * (LSH/IVF) are the sublinear path when query batches grow past
    * broadcast capacity.
    *
    * `broadcastProbes`: the same past-broadcast-capacity switch every
    * other batch ANN lane carries ([[Similarity.probeHint]] — an
    * explicit `broadcast()` hint is UNCONDITIONAL, so a bulk query
    * batch must withhold it). With `false`, the q-side cross join runs
    * as a distributed cartesian and the candidate/rerank joins shuffle
    * on their equi-keys — rows bit-identical (ProjectionSpec pins it),
    * nothing query-sized forced through the driver. */
  def rpTopKBatchOn(emb: DataFrame, queries: DataFrame, k: Int = 10,
      cand: Int = 200, broadcastProbes: Boolean = true): DataFrame = {
    import Similarity.probeHint
    val proj = withRp(emb)
    val qproj = queries.select(col("q_id"), rpArrayOf(col("q_emb")).as("q_rp"))
    val wc = Window.partitionBy(col("q_id"))
      .orderBy(col("rp_sim").desc, col("vec_id"))
    val candidates = proj.crossJoin(probeHint(qproj, broadcastProbes))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.t6(Similarity.cosine(col("rp"), col("q_rp"))).as("rp_sim"))
      .withColumn("rc", row_number().over(wc))
      .filter(col("rc") <= cand)
      .select(col("q_id"), col("vec_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    probeHint(candidates, broadcastProbes)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(probeHint(queries, broadcastProbes), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        Num.t6(Similarity.cosine(col("embedding"), col("q_emb")))
          .as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("q_id", "rn")
  }

  /** `ann_rp_batch` gate — the [[Similarity.annLshBatchPlanted]]
    * contract for the RP lane: planted copies back at rank 1 through
    * the batch lane, full top-k value equality against the Seq lane. */
  def annRpBatchPlanted(s: SparkSession, dir: String, n: Int = 5,
      k: Int = 10): DataFrame = {
    val emb = Similarity.plantedEmb(t(s, dir, "embeddings"), n)
    val queries = emb.filter(col("vec_id") < n)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def keyed(df: DataFrame): Map[Long, Seq[(Long, Double, Int)]] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .groupBy(_._1)
        .map { case (q, rows) =>
          q -> rows.sortBy(_._4).map(t => (t._2, t._3, t._4)).toSeq
        }
    // the two lanes are independent actions — overlap them (guide §2.6)
    val (batch, seqLane) = Par.two(
      keyed(rpTopKBatchOn(emb, queries, k)),
      keyed(rpTopKOn(emb, 0L until n.toLong, k)))
    val rows = (0L until n.toLong).map { qid =>
      val b = batch(qid)
      (qid, b.head._1, 1, b.head._2 >= 0.999999, b == seqLane(qid))
    }
    s.createDataFrame(rows)
      .toDF("q_id", "vec_id", "rn", "is_exact", "agrees_seq_lane")
      .orderBy("q_id")
  }

  /** Planted-probe value gate for [[rpTopK]] — the `lshTopKPlanted`
    * contract: each probe's exact copy projects to the identical rp
    * vector, tops the candidate rank, and exact-reranks to rank 1 with
    * cosine 1.0. Same closed-form oracle, same no-natural-1.0
    * precondition. */
  def rpTopKPlanted(s: SparkSession, dir: String, n: Int = 5): DataFrame =
    Similarity.plantedRank1(
      rpTopKOn(Similarity.plantedEmb(t(s, dir, "embeddings"), n),
        0L until n.toLong))

  /** recall@k of the RP lane vs the exact baseline (natural corpus). */
  def rpRecallAtK(s: SparkSession, dir: String, queryIds: Seq[Long],
      k: Int = 10, cand: Int = 200): DataFrame =
    Similarity.recallAtK(
      Similarity.bruteForceTopKMulti(s, dir, queryIds, k),
      rpTopK(s, dir, queryIds, k, cand), k)
}
