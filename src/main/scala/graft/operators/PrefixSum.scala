package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix sum over a census relation — the
  * cumulative-rank machinery behind Spearman/Dunn ranks, conformal and
  * RFM order-statistic picks, and `Deciles.ntileExact`, rebuilt so that
  * NO unpartitioned window appears anywhere in the plan (the
  * Round11WindowGateSpec contract).
  *
  * The classic formulation `sum(cnt) OVER (ORDER BY val ROWS BETWEEN
  * UNBOUNDED PRECEDING AND -1)` funnels the whole census through ONE
  * task. That is tolerable for genuinely bounded value domains (digit
  * censuses, day grids) but silently becomes a single-task sort of an
  * entity-cardinality relation when the census rides per-user totals or
  * micro-rounded continuous values. This helper is the drop-in for
  * those: the Pack two-level scan (`operators/Pack.scala`) transposed
  * to censuses, with the bucket offsets finished driver-side on stat
  * rows so even the offset pass plans no unpartitioned window.
  *
  *   1. one tiny action reads the census value bounds (two scalars);
  *   2. the value domain chunks into `buckets` contiguous ranges —
  *      monotone in the value order, so bucket-major order IS the
  *      census order;
  *   3. per-bucket count subtotals (≤ `buckets` stat rows, partial
  *      aggregation collapses before the shuffle) collect through
  *      [[graft.util.Guards.countedCollect]] and scan into exclusive
  *      bucket offsets on the driver — the house ≤K-stat-row allowance,
  *      loud on overflow;
  *   4. each bucket computes its local exclusive running sum in a
  *      window PARTITIONED by bucket (parallelism = `buckets`) and
  *      rebases by the broadcast offset.
  *
  * Values are identical to the global-window formulation (prefix sums
  * are exact longs wherever the chunk boundaries fall). The census is
  * cached internally (it is read by the subtotal action and the final
  * plan); callers release via `Caches.releaseAll()` at pipeline
  * boundaries as usual.
  */
object PrefixSum {

  /** Add `outCol` = Σ cntCol over census rows with STRICTLY smaller
    * `valCol` (exclusive prefix sum in `valCol` order).
    *
    * @param census  one row per distinct value — the caller's
    *                `groupBy(valCol)` census; never data-grain rows
    * @param valCol  numeric (long-castable) ordering column; the
    *                bucket ranges derive from its min/max
    * @param cntCol  per-value count/weight (long-castable, non-null)
    * @param outCol  name of the added exclusive-cumsum column (long)
    * @param op      operator label for the offset-collect guard
    * @param buckets chunk count; defaults to 4× default parallelism
    */
  def cumBefore(census: DataFrame, valCol: String, cntCol: String,
      outCol: String, op: String = "PrefixSum.cumBefore",
      buckets: Int = 0): DataFrame = {
    val spark = census.sparkSession
    import spark.implicits._
    val cen = graft.util.Caches.cached(census)
    val nBuckets = math.max(1, if (buckets > 0) buckets
      else spark.sparkContext.defaultParallelism * 4)
    val bounds = cen.agg(min(col(valCol).cast("long")),
      max(col(valCol).cast("long"))).head()
    if (bounds.isNullAt(0)) return cen.withColumn(outCol, lit(0L))
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    // (v − lo) ≥ 0 always, so integer `div` is a true floor here
    val staged = cen.withColumn("__bkt",
      expr(s"(cast(`$valCol` as bigint) - $lo) div $width"))
    val subs = graft.util.Guards.countedCollect(
      staged.groupBy("__bkt")
        .agg(sum(col(cntCol).cast("long")).as("__sub")),
      s"$op: bucket subtotals")
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = subs.map { case (b, s) =>
      val off = acc; acc += s; (b, off)
    }.toSeq.toDF("__bkt", "__boff")
    val wLocal = Window.partitionBy("__bkt")
      .orderBy(col(valCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    staged.join(broadcast(offs), Seq("__bkt"))
      .withColumn(outCol, col("__boff") +
        coalesce(sum(col(cntCol).cast("long")).over(wLocal), lit(0L)))
      .drop("__bkt", "__boff")
  }
}
