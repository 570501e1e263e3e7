package graft.plans

import org.apache.spark.sql.{Column, DataFrame}

/** Writer-side partitioning for hive-layout (`partitionBy`) writes.
  *
  * A keyed `repartition(cols…)` with no explicit partition count is an
  * AQE coalescing candidate: when the exchange is small by BYTES, AQE
  * collapses it toward one post-shuffle partition — correct for shuffle
  * cost, wrong for a partitioned WRITE, where the task then creates
  * every `key=` dir's file sequentially. File count is fixed by the
  * layout either way (one file per directory — each key hashes to
  * exactly one task), so coalescing buys nothing and serializes N
  * parquet-writer setups/commits behind one core (measured on the
  * 128-dir LSH postings shape: 2.1 s coalesced vs 0.9 s parallel at
  * sf0.1, identical files out).
  *
  * The fix pins the exchange at the session's configured shuffle
  * parallelism — a cluster-scale setting (`spark.sql.shuffle.partitions`),
  * never a local constant: partition dirs spread one-per-task up to
  * that parallelism at any scale, and an explicit user count is exactly
  * the signal AQE's coalescing rule already respects. */
object Writers {

  /** `df.repartition(cols…)` with the exchange pinned at the session's
    * shuffle parallelism (AQE-coalesce-exempt). Layout-identical to the
    * unpinned form: same dirs, same one-file-per-dir. */
  def byKeys(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      keys: _*)

  /** [[byKeys]] with a KNOWN distinct-key bound: at most `nKeys`
    * writer tasks — on a small staged batch the empty tasks of a
    * full-parallelism exchange are pure scheduling + task-commit
    * overhead (measured: a 5-dir staged upsert at 32 writer tasks cost
    * ~0.2 s/commit over key-bounded). Still capped at the session's
    * shuffle parallelism so a wide layout spreads across the cluster.
    *
    * This bounds the task count; it does not guarantee one task PER
    * dir: hash-partitioning `nKeys` distinct keys into `nKeys` buckets
    * leaves birthday collisions (~1/e of buckets empty at the limit),
    * so a tail task can write a few dirs sequentially. Layout and file
    * count are unaffected (each key still lands wholly in one task);
    * the residual serialization is bounded by the collision factor,
    * which measured smaller than the empty-task overhead it removes. */
  def byKeysN(df: DataFrame, nKeys: Int, keys: Column*): DataFrame = {
    val cap = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(math.min(math.max(nKeys, 1), cap), keys: _*)
  }
}
