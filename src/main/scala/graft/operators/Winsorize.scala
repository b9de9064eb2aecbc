package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winsorized (percentile-clamped) robust statistics per group — the
  * outlier-resistant mean/extent a profiling pipeline reports when raw
  * means are dominated by a handful of pathological rows (truncated
  * crawls, concatenated files, length-bomb documents).
  *
  * Extends the reference's plain profile stats
  * (`/root/reference/DataFrames/databand_tracking_template.py:20-28`,
  * `with_stats=True`) with the standard robust variant: clamp values into the [pLo, pHi] percentile band, then
  * aggregate.
  *
  * Exact-vs-approx axis, same contract as [[Deciles]] / the profiler:
  *
  *  - `exact = true` (the oracle path): per-group linear-interpolation
  *    percentiles (pandas / DuckDB `quantile_cont` semantics) from the
  *    grouped HISTOGRAM — group by (g, value) first (fully parallel hash
  *    aggregate), then a per-group running count over the DISTINCT values
  *    only. The only sorted relation shrinks by the duplication factor;
  *    raw data rows are never windowed (the q11 profiler design,
  *    `core/Profiler.scala`).
  *  - `exact = false` (the 100 TB path): one `approx_percentile` stat
  *    aggregate per group, no window at all.
  *
  * Determinism: clamped values are quantized to integer micro-points
  * BEFORE the sum, so the winsorized mean is order-independent and
  * cross-engine exact (the q53/q83 convention).
  */
object Winsorize {

  /** Per-group winsorized stats: `(g, n, lo, hi, wsum_micro, wmean)`
    * where lo/hi are the pLo/pHi interpolated percentiles, and
    * wmean = round(wsum_micro / n / 1e6, 6) over clamped values.
    */
  def winsorizedStats(df: DataFrame, groupCol: String, valCol: String,
      pLo: Double, pHi: Double, exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band [$pLo, $pHi]")
    val v = col(valCol).cast("double")
    val bounds =
      if (exact) exactBounds(df, groupCol, valCol, pLo, pHi)
      else df.groupBy(groupCol).agg(
        percentile_approx(v, lit(pLo), lit(accuracy)).as("lo"),
        percentile_approx(v, lit(pHi), lit(accuracy)).as("hi"))
    // bounds is a stat relation (one row per group) — broadcast it back.
    // Clamp in the micro-INTEGER domain: value and bounds are quantized
    // first, then least/greatest compares longs — so a 1-ulp difference
    // in either engine's interpolation arithmetic cannot leak into the
    // sum through the clamp.
    val clamped = df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("__wq",
        least(greatest(round(v * 1e6).cast("long"),
            round(col("lo") * 1e6).cast("long")),
          round(col("hi") * 1e6).cast("long")))
    clamped.groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(first(col("lo")), 4).as("lo"),
        round(first(col("hi")), 4).as("hi"),
        sum("__wq").as("wsum_micro"))
      .withColumn("wmean",
        round(col("wsum_micro") / col("n") / 1e6, 6))
  }

  /** Exact per-group interpolated percentiles from the value histogram:
    * `(g, lo, hi)`. Only DISTINCT (g, value) rows reach the window, and
    * the running count's frame is exact because values are unique within
    * each partition.
    */
  private[operators] def exactBounds(df: DataFrame, groupCol: String,
      valCol: String, pLo: Double, pHi: Double): DataFrame = {
    val grouped = df
      .select(col(groupCol), col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(groupCol, "__v").agg(count(lit(1)).as("__cnt"))
    val byVal = Window.partitionBy(groupCol).orderBy("__v")
    val byGrp = Window.partitionBy(groupCol)
    val cum = grouped.select(col(groupCol), col("__v"), col("__cnt"),
      sum("__cnt").over(byVal).cast("double").as("__cum"),
      sum("__cnt").over(byGrp).cast("double").as("__n"))
    // a distinct value covers 0-based positions [cum-cnt, cum-1]
    def pick(p: Double, end: Column => Column) =
      min(when(end((col("__n") - 1) * p) >= col("__cum") - col("__cnt") &&
        end((col("__n") - 1) * p) < col("__cum"), col("__v")))
    def interp(p: Double): Column = {
      val pos = (first(col("__n")) - 1) * p
      val frac = pos - floor(pos)
      pick(p, floor) + (pick(p, ceil) - pick(p, floor)) * frac
    }
    cum.groupBy(groupCol)
      .agg(interp(pLo).as("lo"), interp(pHi).as("hi"))
  }
}
