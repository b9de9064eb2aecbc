package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group z-score standardization — the feature-normalization step
  * between raw quality signals ([[QualityModel]], [[TextOps]] stats) and
  * anything threshold- or model-based downstream: per-source length
  * scores, per-language quality scores, any "how unusual is this row
  * within its slice" signal.
  *
  * The reference logs raw per-run stats
  * (`/root/reference/DataFrames/databand_tracking_template.py:20-28`);
  * standardization is the canonical next step a pipeline applies to make
  * those stats comparable across slices.
  *
  * Scale shape: one stat aggregate per group (avg + stddev_samp —
  * ddof=1, the q11-proven cross-engine parity), the G-row stat relation
  * re-enters as a BROADCAST join, and the z-score is pure scan-stage
  * arithmetic. No shuffle of data rows, no window.
  *
  * Determinism: mean and stddev are rounded to 6 dp BEFORE the division
  * (both engines land on the same nearest double for a 6-dp decimal), so
  * z = round((x − μ₆)/σ₆, 4) is bit-identical cross-engine — the
  * round-before-compare convention the correctness gate established for
  * thresholds.
  */
object Standardize {

  /** Append a per-group z-score of `valCol` as `zCol`:
    * z = round((x − round(μ, 6)) / round(σ, 6), 4), σ = stddev_samp.
    * Groups with σ = 0 or a single row yield NULL z (no spread to score
    * against) — kept, not dropped, so row counts are stable.
    */
  def zScore(df: DataFrame, groupCol: String, valCol: String,
      zCol: String = "z"): DataFrame = {
    val v = col(valCol).cast("double")
    val stats = df.groupBy(col(groupCol).as("__g"))
      .agg(round(avg(v), 6).as("__mu"),
        round(stddev_samp(v), 6).as("__sigma"))
    df.join(broadcast(stats), col(groupCol) === col("__g"))
      .withColumn(zCol,
        when(col("__sigma") > 0.0,
          round((v - col("__mu")) / col("__sigma"), 4)))
      .drop("__g", "__mu", "__sigma")
  }

  /** Leave-one-out target encoding: append, per row, the mean of
    * `valCol` over the row's `catCol` group EXCLUDING the row itself —
    * the leakage-safe categorical encoding (the naive group mean leaks
    * each row's own target into its feature; LOO is the standard fix
    * when an explicit fold split isn't in play). Singleton groups yield
    * NULL (no peers to average).
    *
    * Determinism: values collapse to MICRO-integers before the group
    * sum (integer aggregate — combine-order-free), and the LOO mean is
    * `(sum_micro − own_micro) / (n − 1) / 10⁶` rounded to 6 dp, the
    * same association both engines.
    *
    * Scale shape: the zScore pattern exactly — one stat aggregate to a
    * G-row relation, re-entering as a BROADCAST join; the encoding is
    * scan-stage arithmetic. No window over the data rows, no shuffle.
    */
  def looTargetEncode(df: DataFrame, catCol: String, valCol: String,
      encCol: String = "loo_mean"): DataFrame = {
    val vm = round(col(valCol) * 1000000.0).cast("long")
    val stats = df.groupBy(col(catCol).as("__g"))
      .agg(sum(round(col(valCol) * 1000000.0).cast("long")).as("__sm"),
        count(lit(1)).as("__n"))
    df.join(broadcast(stats), col(catCol) === col("__g"))
      .withColumn(encCol,
        when(col("__n") > 1,
          round((col("__sm") - vm).cast("double") / (col("__n") - 1)
            / 1000000.0, 6)))
      .drop("__g", "__sm", "__n")
  }

  /** Quantile normalization: map each group's values onto the POOLED
    * distribution by rank, so every group ends up with (a subsample of)
    * the same marginal distribution — the standard cross-source
    * harmonization when raw scales differ by group (length/quality
    * scores across crawl sources, batch effects in omics).
    *
    * Semantics, entirely in the VALUE DOMAIN (no corpus-row windows —
    * group keys are low-cardinality, so a per-row rank window would
    * funnel the corpus through G partitions): for each distinct value v
    * in group g with max-rank position `cum_hi` among the group's n_g
    * rows, the normalized value is the pooled order statistic at
    * ordinal p = ⌈cum_hi · N / n_g⌉ — tied rows map together (max-rank
    * convention), and p lands in [1, N], picked from the pooled
    * cumulative histogram by interval containment (lo < p ≤ hi).
    *
    * Shape: ONE scan into the (g, v) census (cached); the group-side
    * and pooled-side cumulative relations both derive from it, and the
    * containment join is stat-grain × stat-grain with the pooled side
    * broadcast. Products cum_hi·N stay in Long through N ≈ 3·10⁹.
    *
    * Output: (group, value, n_rows, pooled_rank, v_norm), group/value
    * ordered — a mapping table; join it back on (group, value) to
    * rewrite rows.
    */
  def quantileNormalize(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    // runtime teeth on the value-bounded claim: the census feeds
    // unpartitioned windows and a broadcast containment join below, so
    // it asserts the cardinality ceiling in-plan — a valCol that drifts
    // to corpus grain fails loudly instead of single-task sorting
    val census = graft.util.Guards.boundedCensus(
      graft.util.Caches.cached(
        df.select(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
          .groupBy("g", "v").agg(count(lit(1)).as("c"))),
      "quantileNormalize.census")
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val grp = census
      .withColumn("cum_hi", sum("c").over(wg))
      .withColumn("n_g", sum("c").over(Window.partitionBy("g")))
      .withColumn("n_all", sum("c").over(Window.partitionBy()))
      .withColumn("p", expr("(cum_hi * n_all + n_g - 1) div n_g"))
    val wp = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val pool = census.groupBy("v").agg(sum("c").as("pc"))
      .withColumn("hi", sum("pc").over(wp))
      .withColumn("lo", col("hi") - col("pc"))
      .select(col("v").as("v_norm"), col("lo"), col("hi"))
    grp.join(broadcast(pool), col("p") > col("lo") && col("p") <= col("hi"))
      .select(col("g").as(groupCol), col("v").as("value"),
        col("c").as("n_rows"), col("p").as("pooled_rank"), col("v_norm"))
      .orderBy(groupCol, "value")
  }
}
