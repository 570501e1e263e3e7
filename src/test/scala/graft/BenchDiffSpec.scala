package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchDiff

/** The BENCH_FULL.json differ must turn plan drift into HARD findings
  * and leave wall-time movement as an informational note — the
  * mechanical replacement for round-over-round noise adjudication. */
class BenchDiffSpec extends AnyFunSuite {

  private def line(q: String, sec: Double, m: (Long, Long, Long, Long, Long))
      : String =
    s""""$q":$sec""" -> s""""$q":{"scan_bytes":${m._1},"scan_columns":${m._2},"shuffle_records":${m._3},"shuffle_bytes":${m._4},"output_rows":${m._5}}""" match {
      case (a, b) => s"""{"metric":"total","value":$sec,"unit":"sec","queries":{$a},"sf":"x","reps":3,"n_queries":1,"n_oracle":1,"total_sec":$sec,"task_metrics":{$b}}"""
    }

  test("identical runs: no hard findings") {
    val j = line("q1", 1.0, (100L, 5L, 42L, 900L, 7L))
    val r = BenchDiff.parse(j)
    assert(r.queries("q1") === 1.0)
    assert(r.metrics("q1").shufRec === 42L)
    val (hard, _) = BenchDiff.diffQuery("q1", r.metrics.get("q1"),
      r.metrics.get("q1"), 1.0, 1.0)
    assert(hard.isEmpty)
  }

  test("shuffle_records / scan_bytes / output_rows drift are HARD; shuffle_bytes is not") {
    val o = BenchDiff.parse(line("q1", 1.0, (10000L, 5L, 42000L, 900L, 7L)))
    val n = BenchDiff.parse(line("q1", 1.0, (20000L, 6L, 43000L, 901L, 8L)))
    val (hard, notes) = BenchDiff.diffQuery("q1", o.metrics.get("q1"),
      n.metrics.get("q1"), 1.0, 1.0)
    assert(hard.size === 4) // scan_bytes, scan_columns, shuffle_records, output_rows
    assert(hard.exists(_.contains("shuffle_records 42000 -> 43000")))
    assert(hard.exists(_.contains("RESULT drift")))
    assert(!hard.exists(_.contains("shuffle_bytes")))
    assert(notes.exists(_.contains("shuffle_bytes")))
  }

  test("sub-1% count drift is split-boundary jitter — a note, not hard " +
      "(the measured ann_lsh_compact 40350-vs-40347 case); output_rows " +
      "and scan_columns stay exact") {
    val o = BenchDiff.parse(line("q1", 1.0, (7322306L, 5L, 40350L, 900L, 5L)))
    val n = BenchDiff.parse(line("q1", 1.0, (7322400L, 5L, 40347L, 901L, 5L)))
    val (hard, notes) = BenchDiff.diffQuery("q1", o.metrics.get("q1"),
      n.metrics.get("q1"), 1.0, 1.0)
    assert(hard.isEmpty, hard.mkString("; "))
    assert(notes.exists(_.contains("shuffle_records 40350 -> 40347")))
    // but a single-row output drift is ALWAYS hard
    val n2 = BenchDiff.parse(line("q1", 1.0, (7322306L, 5L, 40350L, 900L, 6L)))
    val (hard2, _) = BenchDiff.diffQuery("q1", o.metrics.get("q1"),
      n2.metrics.get("q1"), 1.0, 1.0)
    assert(hard2.exists(_.contains("RESULT drift")))
  }

  test("wall-time movement with clean deterministic columns is a note, never hard") {
    val o = BenchDiff.parse(line("q1", 1.0, (100L, 5L, 42L, 900L, 7L)))
    val n = BenchDiff.parse(line("q1", 2.0, (100L, 5L, 42L, 900L, 7L)))
    val (hard, notes) = BenchDiff.diffQuery("q1", o.metrics.get("q1"),
      n.metrics.get("q1"), 1.0, 2.0)
    assert(hard.isEmpty)
    assert(notes.exists(_.contains("host noise")))
  }

  test("output_rows = -1 (observation missing) is unknown, not drift") {
    val o = BenchDiff.parse(line("q1", 1.0, (100L, 5L, 42L, 900L, -1L)))
    val n = BenchDiff.parse(line("q1", 1.0, (100L, 5L, 42L, 900L, 7L)))
    val (hard, _) = BenchDiff.diffQuery("q1", o.metrics.get("q1"),
      n.metrics.get("q1"), 1.0, 1.0)
    assert(hard.isEmpty)
  }

  test("the pinned repo artifact parses and self-diffs clean") {
    val path = java.nio.file.Paths.get("BENCH_FULL.json")
    assume(java.nio.file.Files.exists(path))
    val r = BenchDiff.parse(new String(
      java.nio.file.Files.readAllBytes(path), "UTF-8"))
    assert(r.queries.nonEmpty)
    // every query self-diffs with zero hard findings
    val hards = r.queries.keys.flatMap { q =>
      BenchDiff.diffQuery(q, r.metrics.get(q), r.metrics.get(q),
        r.queries(q), r.queries(q))._1
    }
    assert(hards.isEmpty)
  }
}
