package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Deterministic decimal truncation for oracle-compared doubles.
  *
  * `round(x, n)` has a half-tie at every .5 boundary of the target scale,
  * and engines disagree there (Spark rounds the exact binary expansion
  * HALF_UP; DuckDB rounds a scaled double half-away-from-zero) — observed
  * once in 5k rows at sf0.1. `floor` has no tie: it is exact on any
  * double, so two engines computing the same IEEE value always truncate
  * identically. Use these (with the matching
  * `floor(x * 10^n) / 10^n` in oracle SQL) for any derived double that
  * needs cross-engine equality. */
object Num {
  /** Truncate to 6 decimals (tie-free cross-engine determinism). */
  def t6(e: Column): Column = floor(e * 1000000.0) / 1000000.0
  /** Driver-side twin of [[t6]]: identical IEEE multiply/floor/divide on
    * a Scala Double, for values computed on the driver (e.g. the
    * ExactQuantiles edge metadata) that re-enter a plan as literals. */
  def t6d(v: Double): Double = math.floor(v * 1000000.0) / 1000000.0
  /** Truncate to 2 decimals. */
  def t2(e: Column): Column = floor(e * 100.0) / 100.0
}
