package graft.store

/** Commit-protocol selector for the materialized ANN index lifecycles
  * ([[graft.operators.Similarity]]'s build/maintain/probe facades).
  *
  *  - [[IndexProtocol.Manifest]] — the library DEFAULT (round 13): the
  *    versioned-manifest snapshot store ([[ManifestStore]]). Nothing
  *    published ever moves, so concurrent scans keep snapshot
  *    isolation with no mid-swap window; it works on flat-namespace
  *    object stores (s3a/gs/wasb), exactly where [[IndexCommit]]
  *    fails fast by design; every retained version stays
  *    time-travel-readable until vacuumed; and it is the measured
  *    winner at scale (BASELINE.md: 2.1× faster than the rename lane
  *    at 30× data with flatter scaling, commit cost O(touched
  *    partitions) + one small-file publish).
  *  - [[IndexProtocol.Rename]] — the hive-tree [[IndexCommit]]
  *    protocol, kept for deployments that need a PLAIN hive layout
  *    other tools can list directly (no manifest indirection). It
  *    carries the documented in-flight-scan caveat and refuses object
  *    stores ([[IndexCommit.requireAtomicRename]]).
  *
  * Both protocols run the same query semantics over the same merged
  * rows — the `*_mf` contract gates pin hash equality against the
  * rename twins' oracles, so flipping a deployment between them
  * changes no result. */
sealed trait IndexProtocol
object IndexProtocol {
  case object Manifest extends IndexProtocol
  case object Rename extends IndexProtocol

  /** The library default: the object-store-safe snapshot protocol. */
  val Default: IndexProtocol = Manifest
}
