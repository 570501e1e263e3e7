package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CosineSim, SketchExpressions}

/** The cosine hot path (the per-row k-wide argmax of every Lloyd round:
  * kmeans_assign/step/iterate, ann_ivf_indexed, semdedup_trained) must
  * run NATIVELY inside codegen — the round-7 interpreted fallback boxed
  * k × dim element reads per row. These specs pin that property so it
  * cannot silently rot back:
  *
  *  1. the expression class itself is not CodegenFallback;
  *  2. generated and interpreted evaluation are BIT-identical (the
  *     oracle-hash contract: doGenCode replicates nullSafeEval's IEEE
  *     accumulation order exactly, including the null/ragged lanes);
  *  3. the actual kmeans_assign plan carries no CodegenFallback
  *     expression anywhere — the argmax composition (array_min over
  *     struct(-cosine, id) literals) stays fully codegen'd end to end.
  */
class CodegenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lit2(a: Array[Double]) =
    Literal.create(a, ArrayType(DoubleType))

  test("CosineSim is natively codegen'd, not CodegenFallback") {
    val e = CosineSim(lit2(Array(1.0, 2.0)), lit2(Array(3.0, 4.0)))
    assert(!e.isInstanceOf[CodegenFallback],
      "the Lloyd-round hot path must not fall back to interpreted eval")
  }

  test("codegen and interpreted cosine evaluation are bit-identical, " +
      "including the null and ragged-length lanes") {
    // normals, antiparallel, ragged (-> null), tiny/huge magnitudes;
    // float rows exercise the float->double read lane
    val rows: Seq[(Array[Double], Array[Double])] = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(1.0, 0.0), Array(-1.0, 0.0)),
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)), // ragged -> null
      (Array(1e-160, 2e-160), Array(3e-160, 4e-160)),
      (Array(1e150, -2e150), Array(-3e150, 4e150)),
      (Array(0.1, 0.2, 0.3), Array(0.30000000000000004, 0.1, 0.7)))
    def evalAll(): Array[Option[Long]] = {
      val df = rows.toDF("a", "b")
        .select(SketchExpressions.cosineSim(col("a"), col("b")).as("c"))
      df.collect().map(r =>
        if (r.isNullAt(0)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(0))))
    }
    val gen = evalAll()
    val prevFac = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevWsc = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try evalAll()
      finally {
        prevFac.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
          spark.conf.set("spark.sql.codegen.factoryMode", _))
        prevWsc.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
          spark.conf.set("spark.sql.codegen.wholeStage", _))
      }
    assert(gen === interp,
      "doGenCode must replicate nullSafeEval bit-for-bit")
    assert(gen(2).isEmpty, "ragged pair must be null in both paths")
  }

  test("float vectors read identically through both paths") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5f, 0.25f, 0.125f)))
      .toDF("a", "b")
      .select(SketchExpressions.cosineSim(col("a"), col("b")).as("c"))
    val gen = df.collect()(0).getDouble(0)
    // interpreted replica with the same float->double widening
    val a = Array(1.0f, 2.0f, 3.0f).map(_.toDouble)
    val b = Array(0.5f, 0.25f, 0.125f).map(_.toDouble)
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    for (i <- a.indices) { xy += a(i) * b(i); xx += a(i) * a(i); yy += b(i) * b(i) }
    assert(java.lang.Double.doubleToRawLongBits(gen) ===
      java.lang.Double.doubleToRawLongBits(xy / (math.sqrt(xx) * math.sqrt(yy))))
  }

  test("SignProject is natively codegen'd and bit-identical to " +
      "interpreted eval, including the null and ragged lanes") {
    val signs = Array.tabulate(2 * 4)(x =>
      graft.operators.Projection.sign(x / 4, x % 4).toByte)
    assert(!graft.functions.SignProject(lit2(Array(1.0)), signs, 2, 0.25)
      .isInstanceOf[CodegenFallback])
    val rows: Seq[Array[Double]] = Seq(
      Array(1.0, 2.0, 3.0, 4.0),
      Array(1e-160, -2e-160, 3e-160, -4e-160),
      Array(0.1, 0.2, 0.30000000000000004, 0.7),
      Array(1.0, 2.0)) // ragged -> null
    def evalAll(): Seq[Option[Seq[Long]]] = {
      val df = rows.map(Tuple1(_)).toDF("v").select(
        SketchExpressions.signProject(col("v"), signs, 2, 0.25).as("p"))
      df.collect().toSeq.map(r =>
        if (r.isNullAt(0)) None
        else Some(r.getSeq[Double](0)
          .map(java.lang.Double.doubleToRawLongBits)))
    }
    val gen = evalAll()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try evalAll()
      finally {
        spark.conf.unset("spark.sql.codegen.factoryMode")
        spark.conf.unset("spark.sql.codegen.wholeStage")
      }
    assert(gen === interp)
    assert(gen(3).isEmpty, "ragged input must be null in both paths")
    // and both equal the hand-unrolled left-to-right fold
    val expect = (0 until 2).map { j =>
      var acc = 0.0
      for (i <- 0 until 4) {
        val x = rows.head(i)
        acc += (if (signs(j * 4 + i) > 0) x else -x)
      }
      java.lang.Double.doubleToRawLongBits(acc * 0.25)
    }
    assert(gen.head.get === expect)
  }

  test("kmeans_assign's optimized plan carries no CodegenFallback " +
      "expression — the Lloyd argmax stays codegen'd end to end") {
    val df = graft.operators.Similarity.kmeansAssign(spark, TestSpark.sf)
    val fallbacks = df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }
      .flatten
      .flatMap(_.collect { case e: CodegenFallback => e })
    assert(fallbacks.isEmpty,
      s"CodegenFallback in the Lloyd hot path: ${fallbacks.map(_.getClass.getSimpleName).distinct}")
  }
}
