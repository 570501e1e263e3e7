package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The normalized schema contract every operator codes against, pinned
  * per table AFTER `Tables.load`'s normalization.
  *
  * Exists because the driver regenerates /root/testdata between rounds
  * and has already shipped the same column under three different
  * physical annotations (`events.ts`: TIMESTAMP(NANOS) → long,
  * µs-no-timezone → TIMESTAMP_NTZ, plain µs TIMESTAMP). Operators see
  * only the post-load schema; this suite makes the next annotation
  * drift fail HERE, loudly and attributably, instead of as 11 scattered
  * plan/stream failures. */
class TableContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def schemaOf(name: String): Map[String, DataType] =
    Tables.load(spark, TestSpark.sf, name)
      .schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: ts normalizes to session-local TIMESTAMP whatever the " +
      "parquet annotation; value columns keep their contract types") {
    val s = schemaOf("events")
    assert(s("ts") === TimestampType,
      "Tables.load must normalize every ts annotation drift to TIMESTAMP")
    assert(s("event_id") === LongType && s("user_id") === LongType)
    assert(s("event_type") === StringType)
    assert(s("value") === DoubleType && s("props") === StringType)
  }

  test("documents: the curation surface's column contract") {
    val s = schemaOf("documents")
    assert(s("doc_id") === LongType && s("text") === StringType)
    assert(s("lang") === StringType && s("source") === StringType)
    assert(s("n_chars") === LongType)
  }

  test("embeddings: vectors arrive as array<float> with int labels") {
    val s = schemaOf("embeddings")
    assert(s("vec_id") === LongType)
    assert(s("embedding") === ArrayType(FloatType, containsNull = true) ||
      s("embedding") === ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float>, got ${s("embedding")}")
    assert(s("label") === IntegerType)
  }

  test("TPC-H side: join keys are long, amounts are double, date " +
      "columns are SOME timestamp flavor (operators compare against " +
      "timestamp literals, which Spark coerces for either flavor)") {
    val li = schemaOf("lineitem")
    assert(li("l_orderkey") === LongType && li("l_partkey") === LongType)
    assert(li("l_extendedprice") === DoubleType &&
      li("l_discount") === DoubleType)
    val tsFlavors: Set[DataType] = Set(TimestampType, TimestampNTZType)
    assert(tsFlavors.contains(li("l_shipdate")),
      s"l_shipdate must be a timestamp flavor, got ${li("l_shipdate")}")
    val o = schemaOf("orders")
    assert(o("o_orderkey") === LongType && o("o_custkey") === LongType)
    assert(tsFlavors.contains(o("o_orderdate")),
      s"o_orderdate must be a timestamp flavor, got ${o("o_orderdate")}")
  }

  test("every contract table loads and is non-empty at sf0.001") {
    Tables.names.foreach { n =>
      assert(Tables.load(spark, TestSpark.sf, n).limit(1).count() === 1L,
        s"table $n must load and hold rows")
    }
  }
}
