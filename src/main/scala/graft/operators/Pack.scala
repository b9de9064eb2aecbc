package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign whole documents to consecutive
  * shards of ≈`budget` tokens each — the pretraining step that cuts a
  * corpus into context-window-sized (or file-sized) work units.
  *
  * Streaming formulation: within each group, docs are laid out in
  * `orderCol` order and shard id = floor(preceding-token-count /
  * budget) — a running (prefix) sum. Docs are kept whole, so shard sizes
  * are budget ± one document; the greedy first-fit alternative packs
  * tighter but is inherently sequential per group and offers no better
  * bound when budget >> max doc size (the pretraining regime).
  *
  * Scale shape — distributed prefix sum, NOT a per-group window. A
  * `Window.partitionBy(groupCol)` running sum serializes each group into
  * one task; with a handful of sources at 100 TB that is a ~10 TB
  * single-reducer sort. Instead the prefix sum is computed in three
  * bounded steps, the textbook two-level scan:
  *
  *   1. chunk the group's order domain into `buckets` contiguous ranges
  *      (`floor(orderCol / width)` — monotone in the layout order, so
  *      bucket-major order IS the layout order);
  *   2. one parallel aggregate computes per-(group, bucket) token
  *      subtotals — the only thing that crosses bucket boundaries, a
  *      relation of ≤ |groups|·|buckets| stat rows (never data rows);
  *      a window over THAT tiny relation turns subtotals into each
  *      bucket's starting offset;
  *   3. each (group, bucket) partition computes its local running sum in
  *      parallel and rebases it by the bucket offset.
  *
  * Result values are identical to the global-window formulation (prefix
  * sums are exact longs, independent of where the chunk boundaries
  * fall); parallelism is |groups|·|buckets| instead of |groups|.
  */
object Pack {

  /** Add `shard` (0-based, per `groupCol`) by running token count.
    *
    * @param tokensCol per-doc token count column
    * @param orderCol  deterministic layout order within the group —
    *                  must be numeric, non-null and unique per row (doc
    *                  ids); rows with null group/order keys are dropped
    *                  by the offset join
    * @param buckets   prefix-sum chunk count (parallelism of the packing
    *                  stage); defaults to 4× the cluster's default
    *                  parallelism
    */
  def assignShards(docs: DataFrame, budget: Long, groupCol: String,
      tokensCol: String = "n_tokens", orderCol: String = "doc_id",
      buckets: Int = 0): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val nBuckets = math.max(1, if (buckets > 0) buckets
      else docs.sparkSession.sparkContext.defaultParallelism * 4)
    // order-domain bounds: one tiny agg returning two scalars
    val bounds = docs.agg(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long")).head()
    val lo = if (bounds.isNullAt(0)) 0L else bounds.getLong(0)
    val hi = if (bounds.isNullAt(1)) 0L else bounds.getLong(1)
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    val staged = docs
      .withColumn("__bkt", floor((col(orderCol).cast("long") - lo) / width))
    // step 2: per-(group, bucket) subtotals → bucket starting offsets.
    // Partial aggregation collapses each scan partition to ≤ buckets rows
    // before any shuffle, so this pass moves only stat rows; it does
    // re-read the (group, order, tokens) projection — when tokensCol is
    // expensive to derive (tokenizing raw text), materialize it upstream
    // so both passes read a cheap column. The offsets window partitions
    // by groupCol, but over the SUBTOTAL relation (≤ groups × buckets
    // rows), not the data.
    val subs = staged.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col(tokensCol)).as("__sub"))
    val wOff = Window.partitionBy(groupCol).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subs
      .withColumn("__off", coalesce(sum("__sub").over(wOff), lit(0L)))
      .select(col(groupCol), col("__bkt"), col("__off"))
    // step 3: partition-local running sum, rebased. The offsets relation
    // is stat rows (≤ groups × buckets), always broadcastable.
    val wLocal = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged.join(broadcast(offsets), Seq(groupCol, "__bkt"))
      .withColumn("shard", floor(
        (col("__off") + sum(col(tokensCol)).over(wLocal) - col(tokensCol)) / budget))
      .select(docs.columns.map(col) :+ col("shard"): _*)
  }
}
