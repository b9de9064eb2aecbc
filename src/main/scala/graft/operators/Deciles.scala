package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile bucketing (token-length deciles and friends), with
  * the same exact-vs-approx axis as the profiler.
  *
  * - `exact = true` (the oracle path): `ntile(n)` over a per-group window
  *   — bit-exact, equal-count buckets, but the window partitions on the
  *   GROUP key. With a handful of groups (sources) that serializes each
  *   group's full sort onto one task: correct at fixture scale, the wrong
  *   plan at 100 TB.
  * - `exact = false` (the 100 TB path): one `approx_percentile` aggregate
  *   computes the n-1 boundary values per group (a stat row per group,
  *   never data rows), then a scan-stage classification assigns each row
  *   `1 + #(boundaries < value)`. No data-path window, no per-group sort;
  *   parallelism is the scan's. Bucket populations are approximate at the
  *   boundaries (sketch error + ties grouping together, where ntile splits
  *   ties by the tiebreak column) — the standard trade.
  */
object Deciles {

  /** Add a `decile` column (1..n) to `df`.
    *
    * @param orderCol tiebreak for the exact path's total order
    * @param accuracy approx_percentile accuracy (1/eps) for the approx path
    */
  def assign(df: DataFrame, groupCol: String, valCol: String,
      orderCol: String, n: Int = 10, exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(n >= 2, "need at least 2 buckets")
    if (exact) {
      val w = Window.partitionBy(groupCol)
        .orderBy(col(valCol).asc, col(orderCol).asc)
      df.withColumn("decile", ntile(n).over(w))
    } else {
      val pcts = array((1 until n).map(i => lit(i.toDouble / n)): _*)
      val bounds = df.groupBy(groupCol)
        .agg(percentile_approx(col(valCol), pcts, lit(accuracy)).as("__bounds"))
      val rank: Column = aggregate(col("__bounds"), lit(0),
        (acc, b) => acc + when(col(valCol) > b, 1).otherwise(0))
      df.join(broadcast(bounds), Seq(groupCol))
        .withColumn("decile", (rank + 1).cast("int"))
        .drop("__bounds")
    }
  }

  /** EXACT global ntile WITHOUT a data-grain window — bit-identical to
    * `ntile(n) OVER (ORDER BY valCol, orderCol)` but never funnels the
    * relation through one task. Two-level rank, the Pack prefix-sum
    * idiom transposed to ranks:
    *
    *   1. a VALUE-DOMAIN census (one row per distinct `valCol`) gets
    *      cumulative start offsets from the [[PrefixSum]] two-level
    *      scan — value grain, never data rows, and window-free even
    *      over the census;
    *   2. each row's within-value position comes from a window
    *      PARTITIONED by `valCol` (parallelism = distinct values),
    *      ordered by the unique `orderCol` tiebreak;
    *   3. global rank = census offset + within-value position, and the
    *      SQL-standard ntile formula (first N mod n buckets take one
    *      extra row) maps rank → bucket with pure scalar arithmetic.
    *
    * N rides a one-row stat action off the cached census. `orderCol`
    * must be unique per row (ids) for the rank to be well defined —
    * the same precondition the window form needs for determinism.
    */
  def ntileExact(df: DataFrame, valCol: String, orderCol: String,
      n: Int, outCol: String = "tile"): DataFrame = {
    require(n >= 1, "need at least 1 bucket")
    val cen = graft.util.Caches.cached(
      df.groupBy(col(valCol).as("__v")).agg(count(lit(1)).as("__c")))
    val nRows = Option(cen.agg(sum("__c").cast("long")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val base = nRows / n
    val extra = nRows % n
    // census offsets via the PrefixSum two-level scan — the census is
    // value-domain here, but the idiom costs nothing and keeps the
    // whole plan free of unpartitioned windows at ANY census grain
    val offs = PrefixSum
      .cumBefore(cen, "__v", "__c", "__off", "ntileExact.offsets")
      .select(col("__v"), col("__off"))
    val wIn = Window.partitionBy(col(valCol)).orderBy(col(orderCol))
    // SQL `div` keeps the bucket arithmetic in exact longs (Column./
    // is double division); the else-branch divisor is guarded to 1
    // when base = 0, where the first branch already covers every rank
    df.join(offs, col(valCol) === col("__v"))
      .withColumn("__rank", col("__off") + row_number().over(wIn))
      .withColumn(outCol, expr(
        s"""cast(case
           |  when $extra > 0 and __rank <= ${(base + 1) * extra}
           |    then (__rank - 1) div ${base + 1} + 1
           |  else $extra +
           |    (__rank - 1 - ${extra * (base + 1)}) div ${math.max(base, 1L)} + 1
           |end as int)""".stripMargin))
      .drop("__v", "__off", "__rank")
  }

  /** The decile report shape q58 exposes: per-(group, decile) row count
    * and value min/max.
    */
  def report(df: DataFrame, groupCol: String, valCol: String,
      orderCol: String, n: Int = 10, exact: Boolean = true,
      accuracy: Int = 10000): DataFrame =
    assign(df, groupCol, valCol, orderCol, n, exact, accuracy)
      .groupBy(col(groupCol), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(valCol)).as(s"min_tokens"),
        max(col(valCol)).as(s"max_tokens"))
      .orderBy(col(groupCol), col("decile"))

  /** Approx-decile boundary FIDELITY report (q58a's driver-green form):
    * the approx path's per-group `percentile_approx` boundaries graded
    * IN-PLAN against the exact order statistics they approximate. One
    * row per (group, boundary i=1..n-1): `q_exact` is the exact
    * interpolated quantile at i/n (quantile_cont semantics, the q11
    * cross-engine idiom) and `within_bound` checks the approx boundary
    * landed inside the exact ±0.01-QUANTILE value window
    * [pick(i/n−.01, floor), pick(i/n+.01, ceil)] — `percentile_approx`
    * carries a deterministic n/accuracy rank guarantee (n/10000 at the
    * default), so the window is 100× its contract: green is certain,
    * a far-past-contract sketch regression goes red. All exact values
    * come from ONE value-domain census (group, value, count) — the
    * boundary grading never sorts raw rows.
    *
    * Output per (group, bound_idx): (group, bound_idx, n_rows, q_exact,
    * within_bound).
    */
  def boundaryFidelity(df: DataFrame, groupCol: String, valCol: String,
      n: Int = 10, accuracy: Int = 10000): DataFrame = {
    require(n >= 2, "need at least 2 buckets")
    val qw = 0.01
    val pcts = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val approx = df.groupBy(col(groupCol).as("g"))
      .agg(percentile_approx(col(valCol).cast("double"), pcts,
        lit(accuracy)).as("apcts"))
    val census = df
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val byVal = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val byGrp = Window.partitionBy("g")
    val cum = census.select(col("g"), col("v"), col("cnt"),
      sum("cnt").over(byVal).cast("double").as("cum"),
      sum("cnt").over(byGrp).cast("double").as("nr"))
    def pick(p: Double, end: Column => Column) =
      min(when(end((col("nr") - 1) * p) >= col("cum") - col("cnt") &&
        end((col("nr") - 1) * p) < col("cum"), col("v")))
    def interp(p: Double): Column = {
      val pos = (first(col("nr")) - 1) * p
      val frac = pos - floor(pos)
      round(pick(p, floor) + (pick(p, ceil) - pick(p, floor)) * frac, 4)
    }
    val aggs = (1 until n).flatMap { i =>
      val p = i.toDouble / n
      // clamp the ±qw window to [0,1]: for n > 100 the extreme
      // boundaries would otherwise probe quantiles outside the domain,
      // pick() would return NULL bounds, and within_bound would go
      // silently NULL instead of grading anything — clamped, the
      // window falls back to the min/max order statistics
      Seq(interp(p).as(s"q$i"),
        pick(math.max(0.0, p - qw), floor).as(s"lo$i"),
        pick(math.min(1.0, p + qw), ceil).as(s"hi$i"))
    } :+ first(col("nr")).cast("long").as("n_rows")
    val ex = cum.groupBy("g").agg(aggs.head, aggs.tail: _*)
    val flags = ex.join(approx, Seq("g"))
    val stackArgs = (1 until n).map { i =>
      s"$i, n_rows, q$i, apcts[${i - 1}] >= lo$i AND apcts[${i - 1}] <= hi$i"
    }.mkString(", ")
    flags.selectExpr("g",
        s"stack(${n - 1}, $stackArgs) as " +
          "(bound_idx, n_rows, q_exact, within_bound)")
      .select(col("g").as(groupCol), col("bound_idx").cast("int"),
        col("n_rows"), col("q_exact"), col("within_bound"))
      .orderBy(groupCol, "bound_idx")
  }

  /** WEIGHTED median per group — "the median doc length by TOKEN MASS,
    * not by document count": the value where half the total weight
    * sits at or below, the pick any mixture/packing decision should
    * read instead of the unweighted median when units differ wildly in
    * size. Integer convention: the picked value is the smallest v with
    * cumWeight(v) ≥ (totalWeight + 1) div 2 (the q11 exact-median
    * census pick, weights replacing counts).
    *
    * Value-domain throughout: one (group, value) weighted census, a
    * cumulative window over DISTINCT values per group, one pick.
    *
    * Output per group: (group, n_rows, total_weight, wmedian).
    */
  def weightedMedian(df: DataFrame, groupCol: String, valCol: String,
      weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = df
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .groupBy("g", "v")
      .agg(count(lit(1)).as("c"), sum("w").as("wsum"))
    val cum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy("g")
    census
      .withColumn("cw", sum("wsum").over(cum))
      .withColumn("tw", sum("wsum").over(all))
      .withColumn("n", sum("c").over(all))
      .groupBy(col("g").as(groupCol), col("n").as("n_rows"),
        col("tw").as("total_weight"))
      .agg(min(when(col("cw") >= expr("(tw + 1) div 2"), col("v")))
        .as("wmedian"))
      .orderBy(groupCol)
  }
}
