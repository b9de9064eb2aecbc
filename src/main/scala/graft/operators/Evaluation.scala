package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-quality evaluation over corpus-scale score columns.
  *
  * Quality filtering (the q48/q105 scorers) is only trustworthy with an
  * evaluation loop: given a score column and a binary label column, how
  * well does the score rank positives above negatives (AUC), and do the
  * score magnitudes mean what they claim (calibration)? Both reports are
  * built to the house scale rules:
  *
  *  - NO corpus-scale windows. The naive AUC formulation ranks every row
  *    in one global window (single-partition sort — the q58 hazard).
  *    Here the corpus first collapses to its (group, distinct score)
  *    histogram with per-score positive/negative counts; ranking windows
  *    run over the VALUE DOMAIN (the madOutliers move), so a 100 TB
  *    corpus with 12-bit scores costs 4096 window rows per group.
  *  - Integer-exact cores. AUC's pair count is the doubled integer
  *    `Σ pos_s · (2·cumneg_<s + neg_s)` (ties count once — the ½ washes
  *    out in the doubling), so the only float is the final division.
  *    Calibration bins by exact integer arithmetic off ONE broadcast
  *    min/max stat row (the PSI frozen-bounds move) and reports floor
  *    means and ppm rates — no float accumulates anywhere.
  */
object Evaluation {

  /** Per-group ROC AUC by the rank-sum (Mann-Whitney) identity over the
    * distinct-score histogram.
    *
    * `auc_num2` = 2·Σ_{pos p, neg n} [score_p > score_n] + #ties, an
    * exact integer; `auc` = auc_num2 / (2·n_pos·n_neg) rounded 6 dp
    * (NULL when a group lacks positives or negatives — AUC is undefined,
    * not 0, on one-class groups).
    */
  def aucReport(df: DataFrame, groupCol: String, scoreCol: String,
      label: Column): DataFrame = {
    val h = df
      .select(col(groupCol).as("g"), col(scoreCol).as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy("g", "s")
      .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))
    // Window over the DISTINCT-SCORE domain of each group, never rows.
    val below = Window.partitionBy("g").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("cumneg", coalesce(sum("neg").over(below), lit(0L)))
      .groupBy("g")
      .agg(sum("pos").as("n_pos"), sum("neg").as("n_neg"),
        sum(col("pos") * (lit(2L) * col("cumneg") + col("neg"))).as("auc_num2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("auc_num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)))
      .select(col("g").as(groupCol), col("n_pos"), col("n_neg"),
        col("auc_num2"), col("auc"))
      .orderBy(groupCol)
  }

  /** Reliability (calibration) bins for an integer score column: fixed
    * equal-width bins frozen from the corpus min/max (ONE broadcast stat
    * row), per bin the row count, positive count, floor-mean score and
    * positive rate in ppm — every column an exact integer.
    *
    * bin = ((s − min) · nBins) div (max − min + 1) ∈ [0, nBins), exact on
    * integers with no clamping edge case (the +1 makes the top score land
    * in the last bin, not past it).
    */
  def calibrationReport(df: DataFrame, scoreCol: String, label: Column,
      nBins: Int = 10): DataFrame = {
    val v = df.select(col(scoreCol).cast("long").as("s"),
      when(label, 1L).otherwise(0L).as("y"))
    val bounds = v.agg(min("s").as("mn"), max("s").as("mx"))
    v.crossJoin(broadcast(bounds))
      .withColumn("bin",
        expr(s"((s - mn) * $nBins) div (mx - mn + 1)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"), sum("y").as("n_pos"),
        expr("sum(s) div count(1)").as("mean_score_floor"),
        expr("(sum(y) * 1000000) div count(1)").as("pos_rate_ppm"))
      .orderBy("bin")
  }

  /** Precision/recall sweep — one (precision, recall) point per
    * DISTINCT score threshold, for the "pick the quality-filter cutoff"
    * decision [[aucReport]]'s single number can't make. Classifying
    * positive at score ≥ t: TP/FP accumulate down the score-DESC
    * histogram (value-domain windows over distinct scores, never rows);
    * precision/recall land as exact integer ppm floor divisions.
    *
    * Output per threshold (score DESC): (threshold, tp, fp, fn,
    * precision_ppm, recall_ppm).
    */
  def prCurve(df: DataFrame, scoreCol: String, label: Column): DataFrame = {
    val h = df
      .select(col(scoreCol).cast("long").as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy("s")
      .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    h
      .withColumn("tp", sum("pos").over(wDesc))
      .withColumn("fp", sum("neg").over(wDesc))
      .withColumn("p_all", sum("pos").over(wAll))
      .select(col("s").as("threshold"), col("tp"), col("fp"),
        (col("p_all") - col("tp")).as("fn"),
        expr("(tp * 1000000) div (tp + fp)").as("precision_ppm"),
        expr("(tp * 1000000) div p_all").as("recall_ppm"))
      .orderBy(col("threshold").desc)
  }
}
