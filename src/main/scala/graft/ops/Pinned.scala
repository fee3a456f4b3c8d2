package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic lifecycle control for checkpoint-pinned storage blocks.
  *
  * Spark never GC-frees `localCheckpoint` blocks in-process: the
  * round-13 probe showed that even a fully-consumed, dereferenced
  * checkpointed frame stays in `SparkContext.getPersistentRDDs`
  * indefinitely (the ContextCleaner path needs the internal RDD object
  * to become unreachable, and driver-side plan state keeps it alive),
  * and `spark.catalog.clearCache()` does not touch those blocks either —
  * only CacheManager entries. So every iterative operator that
  * checkpoints per round MUST free the superseded round explicitly, and
  * long-lived sessions (a library caller, the 336-query bench sweep)
  * need a blunt end-of-call sweep. This object provides both.
  *
  * Tracking is by persistent-RDD-id diff around the checkpoint call —
  * `Dataset.localCheckpoint` registers its internal RDD in
  * `persistentRdds` synchronously (persist-at-mark), so the diff is
  * exact on the sequential driver paths that build graft plans; the
  * method is synchronized so concurrent graft calls on one session
  * cannot interleave diffs and free each other's blocks.
  */
private[graft] object Pinned {

  /** `df.localCheckpoint(eager)` plus a free handle for exactly the
    * blocks that call pinned. Loops call the handle when a round is
    * superseded; straight-line ops call it once downstream consumers
    * are materialized. Freeing is idempotent and non-blocking. */
  def checkpoint(df: DataFrame, eager: Boolean = true): (DataFrame, () => Unit) =
    synchronized {
      val sc = df.sparkSession.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val cp = df.localCheckpoint(eager)
      val added = (sc.getPersistentRDDs.keySet -- before).toSeq
      (cp, () => {
        val m = sc.getPersistentRDDs
        added.foreach(id => m.get(id).foreach(_.unpersist(blocking = false)))
      })
    }

  /** Run `body` and free every block it pinned before returning — for
    * side-effecting scopes (a foreachBatch closure that writes parquet)
    * whose internal helpers checkpoint. The body's RESULT must not
    * depend on blocks pinned inside (checkpoint lineage is cut, so a
    * freed block is unrecoverable) — return Unit or driver-side values. */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally {
      val m = sc.getPersistentRDDs
      (m.keySet -- before).foreach(id => m.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  /** Free EVERY pinned storage block on the session: CacheManager entries
    * (explicit persists) and checkpoint blocks alike. Everything graft
    * pins is recompute-from-source-able by construction, so this is
    * always safe — at worst a live lazy frame recomputes its next action.
    * Harness scope: Verify/Bench call this between registry entries so no
    * query inherits a predecessor's blocks (the round-12 sweep saw
    * warm ≫ cold artifacts from exactly this accumulation); library
    * callers can use it as end-of-pipeline hygiene via
    * [[graft.api.GraftApi.releasePinned]]. */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
