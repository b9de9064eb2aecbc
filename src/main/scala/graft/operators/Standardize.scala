package graft.operators

import org.apache.spark.sql.DataFrame
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
}
