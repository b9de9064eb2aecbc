package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter–pruned join: the hand-rolled form of Spark's runtime
  * row-level filtering, for when the optimizer's `InjectRuntimeFilter`
  * doesn't fire (non-equi follow-ups, pre-filtered dimension sides,
  * multi-column keys) — at 100 TB the difference between shuffling every
  * fact row and shuffling only the ~join-selectivity fraction is the
  * job.
  *
  * Mechanics: ONE aggregate over the small side builds a Catalyst-native
  * `BloomFilterAggregate` sketch of the xxhash64'd key (the identical
  * expression pair Spark's own runtime filters use); the bytes come back
  * to the driver as a single stat scalar (megabytes at most — this is
  * the one collect, and it is a sketch, not data rows) and re-enter the
  * plan as a literal inside `BloomFilterMightContain` on the big side's
  * SCAN stage. False positives only cost wasted shuffle rows — the real
  * join still runs, so the result is EXACTLY the plain join (the oracle
  * is the plain join, q46-style).
  *
  * Sizing: numBits defaults to 16 bits/item (<1% fpp), floor 64.
  */
object BloomJoin {

  private def xxh(cols: Seq[Column]): Column =
    GraftExpressionBridge.column(
      XxHash64(cols.map(GraftExpressionBridge.expression), 42L))

  /** Build the bloom bytes from the small side's key columns (null keys
    * never match an inner join, so they are dropped first). Returns null
    * iff the small side is empty.
    *
    * Sizing needs the item count BEFORE the aggregate (it is a literal
    * in the plan) — callers that know their cardinality should pass
    * `expectedItems` to skip the count job; otherwise the keyed
    * projection is persisted so count + sketch are one materialization,
    * not two scans.
    */
  def buildBloom(small: DataFrame, keys: Seq[String],
      bitsPerItem: Long = 16L, expectedItems: Long = -1L): Array[Byte] = {
    val keyed = small.na.drop(keys).select(keys.map(col): _*)
    val cached = if (expectedItems < 0L) keyed.persist() else keyed
    try {
      val items = if (expectedItems >= 0L) expectedItems else cached.count()
      if (items == 0L) return null
      val agg = GraftExpressionBridge.column(
        new BloomFilterAggregate(
          GraftExpressionBridge.expression(xxh(keys.map(col))),
          Literal(items), Literal(math.max(items * bitsPerItem, 64L)))
          .toAggregateExpression())
      cached.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
    } finally if (expectedItems < 0L) { cached.unpersist(); () }
  }

  /** The big-side pruning predicate for a prebuilt bloom. */
  def mightContain(bloom: Array[Byte], keyCols: Seq[Column]): Column =
    GraftExpressionBridge.column(BloomFilterMightContain(
      Literal(bloom),
      GraftExpressionBridge.expression(xxh(keyCols))))

  /** Inner join with the big side pre-pruned by the small side's bloom.
    * Result ≡ `big.join(small, keys)` — the bloom is conservative — but
    * only rows passing the scan-stage membership test reach the join's
    * exchange.
    */
  def prunedInnerJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String], bitsPerItem: Long = 16L): DataFrame = {
    val bloom = buildBloom(small, keys, bitsPerItem)
    if (bloom == null) return big.join(small, keys).limit(0)
    big.filter(mightContain(bloom, keys.map(col))).join(small, keys)
  }
}
