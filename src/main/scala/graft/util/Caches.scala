package graft.util

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal cached DataFrames.
  *
  * Several pipelines (MinHash LSH banding, SimHash signatures, candidate
  * verification) cache an intermediate because a self-join would otherwise
  * recompute the whole upstream pipeline once per side. Those caches are
  * invisible to the caller, so in a long-lived session (a monitor daemon,
  * a bench loop) they would accumulate storage memory indefinitely.
  *
  * Operators route every internal `.cache()` through [[cached]]; callers
  * invoke [[releaseAll]] at pipeline boundaries (after the consuming
  * action) to drop them. Unpersisting is safe even if a downstream plan
  * still references the DataFrame — Spark just recomputes.
  */
object Caches {
  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and register it for later release. */
  def cached(df: DataFrame): DataFrame = {
    df.cache()
    registry.add(df)
    df
  }

  /** Unpersist (non-blocking) every registered cache and clear the registry. */
  def releaseAll(): Unit = {
    var df = registry.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = registry.poll()
    }
  }

  /** Release the MEMORY_AND_DISK blocks behind an eager
    * `localCheckpoint()` once its consumers have run. `unpersist` on the
    * checkpointed Dataset is a no-op (the blocks belong to the
    * materialized internal RDD, not a cache entry), so a long-running
    * foreachBatch loop would accumulate checkpoint blocks until the
    * ContextCleaner happens to GC the RDD handles (round-12 ADVICE).
    * The checkpointed Dataset's plan is a `LogicalRDD` leaf over that
    * RDD — unpersist it directly.
    *
    * CONTRACT (round-13 ADVICE): this is a DESTRUCTIVE release, not a
    * cache eviction. A localCheckpoint truncates lineage — once its
    * backing blocks are dropped they cannot be recomputed, so the
    * DataFrame (and ANY plan derived from it) must not be executed
    * again after this call. Call it only at end-of-life, after every
    * consumer has run. It is a no-op on plans with no LogicalRDD
    * leaves, but "no-op on non-checkpoints" does not make it safe to
    * sprinkle: a plan that DOES contain a checkpoint dies on its next
    * action with missing-block errors.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
