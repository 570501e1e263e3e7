package graft.tools

/** Mechanical round-over-round regression gate for BENCH_FULL.json.
  *
  * `runMain graft.tools.BenchDiff old.json new.json`
  *
  * Wall time on a shared host swings ±30-50% per query, so every
  * round's perf review used to degenerate into noise adjudication
  * (round-10 verdict item 2 — this round's `ann_ivf_compact` 4.70-vs-
  * 6.45 chase is the canonical example: hours of A/B to conclude
  * "noise"). The bench now records PLAN-derived columns per query
  * (`task_metrics`: scan_bytes, scan_columns, shuffle_records,
  * shuffle_bytes, output_rows); this tool diffs two pinned files on
  * them and makes the verdict mechanical:
  *
  *  - `scan_bytes` / `shuffle_records` drift beyond the jitter band
  *    (>1% relative AND >64 absolute) → lost partition pruning or an
  *    exchange appeared/disappeared/moved (broadcast↔shuffle) — HARD
  *    finding. The band exists because scratch-lifecycle lanes have a
  *    measured sub-0.01% nondeterminism: row arrival order inside a
  *    shuffle partition varies run to run → zstd-compressed scratch
  *    index files differ by a few bytes → `maxPartitionBytes` split
  *    boundaries shift → partial WindowGroupLimit emits a handful
  *    more/fewer pre-exchange rows (observed: ann_lsh_compact
  *    40,350 vs 40,347 on identical code). Real regressions move
  *    these columns by integer factors, not fractions of a percent;
  *    sub-band drift is reported as a note.
  *  - `scan_columns` drift (any)           → lost column pruning —
  *    HARD finding (schema widths cannot jitter);
  *  - `output_rows` drift (any)            → the result itself changed
  *    — HARD finding (correctness, not perf);
  *  - wall-time ratio outside [1/1.5, 1.5] with CLEAN deterministic
  *    columns → flagged as noise-or-host, NOT a plan regression —
  *    the scoped-floor re-measure discipline applies, nothing else;
  *  - `shuffle_bytes` is reported but never flagged (compressed
  *    framing varies with partition boundaries).
  *
  * `output_rows = -1` means the observation didn't ride that run
  * (failed action or pre-metrics pin) — treated as unknown, not drift.
  *
  * Exit code: 0 = no deterministic drift (wall noise at most),
  * 1 = at least one HARD finding, 2 = usage/parse error. The driver or
  * judge can gate on it directly. */
object BenchDiff {

  final case class M(scanBytes: Long, scanCols: Long, shufRec: Long,
      shufBytes: Long, outRows: Long)

  final case class Run(queries: Map[String, Double],
      metrics: Map[String, M], total: Double)

  def parse(text: String): Run = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(text)
    def num(v: JValue): Double = v match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case _ => Double.NaN
    }
    def lng(v: JValue): Long = v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JDouble(d) => d.toLong
      case JDecimal(d) => d.toLong
      case _ => -1L
    }
    val queries = (j \ "queries") match {
      case JObject(fs) => fs.map { case (k, v) => k -> num(v) }.toMap
      case _ => Map.empty[String, Double]
    }
    val metrics = (j \ "task_metrics") match {
      case JObject(fs) => fs.map { case (k, v) =>
        k -> M(lng(v \ "scan_bytes"), lng(v \ "scan_columns"),
          lng(v \ "shuffle_records"), lng(v \ "shuffle_bytes"),
          lng(v \ "output_rows"))
      }.toMap
      case _ => Map.empty[String, M]
    }
    Run(queries, metrics, num(j \ "total_sec"))
  }

  /** One query's verdict: (hard findings, informational notes). */
  def diffQuery(name: String, om: Option[M], nm: Option[M],
      osec: Double, nsec: Double): (Seq[String], Seq[String]) = {
    val hard = Seq.newBuilder[String]
    val note = Seq.newBuilder[String]
    // split-boundary jitter band (object doc): count columns fed by
    // scratch-written files move sub-0.01% run-to-run on identical
    // code; real plan regressions move them by integer factors
    def beyondJitter(a: Long, b: Long): Boolean = {
      val diff = math.abs(a - b)
      diff > 64 && diff.toDouble / math.max(math.max(a, b), 1L) > 0.01
    }
    (om, nm) match {
      case (Some(o), Some(n)) =>
        // -1 is the "no QE event / failed action" sentinel on EVERY
        // column — a one-sided -1 is missing data, never drift
        def both(a: Long, b: Long): Boolean = a >= 0 && b >= 0
        def oneSided(col: String, a: Long, b: Long): Unit =
          if ((a < 0) != (b < 0))
            note += s"$name: $col unmeasured on one side ($a -> $b)"
        oneSided("scan_bytes", o.scanBytes, n.scanBytes)
        oneSided("scan_columns", o.scanCols, n.scanCols)
        oneSided("shuffle_records", o.shufRec, n.shufRec)
        oneSided("output_rows", o.outRows, n.outRows)
        if (both(o.scanBytes, n.scanBytes)) {
          if (beyondJitter(o.scanBytes, n.scanBytes))
            hard += s"$name: scan_bytes ${o.scanBytes} -> ${n.scanBytes} (pruning or scan change)"
          else if (o.scanBytes != n.scanBytes)
            note += s"$name: scan_bytes ${o.scanBytes} -> ${n.scanBytes} (within jitter band)"
        }
        if (both(o.scanCols, n.scanCols) && o.scanCols != n.scanCols)
          hard += s"$name: scan_columns ${o.scanCols} -> ${n.scanCols} (column pruning change)"
        if (both(o.shufRec, n.shufRec)) {
          if (beyondJitter(o.shufRec, n.shufRec))
            hard += s"$name: shuffle_records ${o.shufRec} -> ${n.shufRec} (exchange added/moved/removed)"
          else if (o.shufRec != n.shufRec)
            note += s"$name: shuffle_records ${o.shufRec} -> ${n.shufRec} (within jitter band)"
        }
        if (both(o.outRows, n.outRows) && o.outRows != n.outRows)
          hard += s"$name: output_rows ${o.outRows} -> ${n.outRows} (RESULT drift)"
        if (both(o.shufBytes, n.shufBytes) && o.shufBytes != n.shufBytes)
          note += s"$name: shuffle_bytes ${o.shufBytes} -> ${n.shufBytes} (framing-dependent, not flagged)"
      case _ =>
        note += s"$name: task_metrics missing on one side (pre-metrics pin?)"
    }
    if (osec > 0 && nsec > 0) {
      val ratio = nsec / osec
      if (ratio > 1.5 || ratio < 1 / 1.5)
        note += f"$name: wall ${osec}%.2fs -> ${nsec}%.2fs (${ratio}%.2fx)" +
          " — deterministic columns decide; if clean, host noise"
    }
    (hard.result(), note.result())
  }

  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: BenchDiff <old BENCH_FULL.json> <new BENCH_FULL.json>")
      sys.exit(2)
    }
    val (o, n) =
      try (parse(read(args(0))), parse(read(args(1))))
      catch { case e: Throwable =>
        System.err.println(s"[benchdiff] parse failure: ${e.getMessage}")
        sys.exit(2); return
      }
    val added = (n.queries.keySet -- o.queries.keySet).toSeq.sorted
    val removed = (o.queries.keySet -- n.queries.keySet).toSeq.sorted
    if (added.nonEmpty)
      println(s"[benchdiff] added queries (no old record): ${added.mkString(", ")}")
    if (removed.nonEmpty)
      println(s"[benchdiff] REMOVED queries: ${removed.mkString(", ")}")
    val common = (o.queries.keySet intersect n.queries.keySet).toSeq.sorted
    var hardCount = 0
    common.foreach { q =>
      val (hard, notes) = diffQuery(q, o.metrics.get(q), n.metrics.get(q),
        o.queries(q), n.queries(q))
      hard.foreach { h => hardCount += 1; println(s"[benchdiff] HARD $h") }
      notes.foreach(x => println(s"[benchdiff] note $x"))
    }
    val commonOld = common.map(o.queries).sum
    val commonNew = common.map(n.queries).sum
    println(f"[benchdiff] common ${common.size} queries: wall ${commonOld}%.1f -> ${commonNew}%.1f s; hard findings: $hardCount; removed: ${removed.size}")
    sys.exit(if (hardCount > 0 || removed.nonEmpty) 1 else 0)
  }

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      "UTF-8")
}
