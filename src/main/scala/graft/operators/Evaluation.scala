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

  /** Murphy decomposition of the BRIER score (public method: Murphy
    * 1973; Brier 1950): over calibration bins of a micro-probability
    * forecast, Brier ≈ reliability − resolution + uncertainty —
    * reliability says "the forecasts disagree with their bin's event
    * rate" (the fixable part), resolution says "the bins separate
    * outcomes" (the skill), uncertainty is the outcome's own variance
    * floor. The exact Brier (raw-row mean squared error) is reported
    * alongside, so the decomposition's binning error is visible.
    *
    * Exactness: `probMicroCol` ∈ [0, 10⁶]; bin means are floor
    * divisions, every numerator is an exact integer in micro² (the
    * per-bin contributions are integers, so the Σ is order-free), and
    * only the final /10¹² · round(·,6) leaves the integer domain.
    * Shape: one row pass for bins and the exact Brier, then stat-grain
    * algebra over ≤ nBins rows.
    *
    * Output (1 row): (n, n_pos, n_bins_used, brier, reliability,
    * resolution, uncertainty).
    */
  def brierReport(df: DataFrame, probMicroCol: String, label: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins")
    val dec = "decimal(38,0)"
    val v = graft.util.Caches.cached(df
      .select(col(probMicroCol).cast("long").as("pm"),
        when(label, 1L).otherwise(0L).as("y"))
      .withColumn("bin", expr(s"(pm * $nBins) div 1000001")))
    val bins = v.groupBy("bin")
      .agg(count(lit(1)).as("n_k"), sum("pm").as("spm"),
        sum("y").as("sy"))
      .select(col("bin"), col("n_k"), col("sy"),
        expr("spm div n_k").as("fbar"),
        expr("(sy * 1000000) div n_k").as("obar"))
    val tot = v.agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
      sum(expr(s"cast((pm - y * 1000000) * (pm - y * 1000000) as $dec)"))
        .as("bsum"))
      .withColumn("obar_all", expr("(n_pos * 1000000) div n"))
    val parts = bins.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_bins_used"),
        sum(expr(s"cast(n_k as $dec) * (fbar - obar) * (fbar - obar)"))
          .as("rel_num"),
        sum(expr(s"cast(n_k as $dec) * (obar - obar_all) * " +
          "(obar - obar_all)")).as("res_num"))
    tot.crossJoin(broadcast(parts))
      .select(col("n"), col("n_pos"), col("n_bins_used"),
        round(col("bsum").cast("double") /
          (col("n").cast("double") * 1e12), 6).as("brier"),
        round(col("rel_num").cast("double") /
          (col("n").cast("double") * 1e12), 6).as("reliability"),
        round(col("res_num").cast("double") /
          (col("n").cast("double") * 1e12), 6).as("resolution"),
        round(col("obar_all").cast("double") *
          (lit(1e6) - col("obar_all").cast("double")) / 1e12, 6)
          .as("uncertainty"))
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
    // cached + ceiling-guarded: the threshold census feeds
    // unpartitioned cumulative windows, so a score domain that drifts
    // to corpus grain fails loudly instead of single-task sorting
    val h = graft.util.Guards.boundedCensus(
      graft.util.Caches.cached(df
        .select(col(scoreCol).cast("long").as("s"),
          when(label, 1L).otherwise(0L).as("y"))
        .groupBy("s")
        .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))),
      "prCurve.scoreCensus")
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

  /** AVERAGE PRECISION (the area under [[prCurve]], the
    * single-number PR summary that, unlike ROC-AUC, stays honest
    * under heavy class imbalance — the usual regime for quality
    * filters where positives are rare): AP = Σ_t (R_t − R_{t−1})·P_t
    * down the score-DESC threshold sweep.
    *
    * Same value-domain census as prCurve (one row per DISTINCT
    * score, cumulative windows over stat rows); each threshold
    * contributes the integer `(Δtp · tp · 10⁶) div (tp + fp)` so the
    * Σ is order-free, and AP_ppm is one final division by the
    * positive total.
    *
    * Output (1 row): (n, n_pos, n_thresholds, ap_ppm).
    */
  def averagePrecision(df: DataFrame, scoreCol: String,
      label: Column): DataFrame = {
    // same ceiling-guarded census as prCurve (see there)
    val h = graft.util.Guards.boundedCensus(
      graft.util.Caches.cached(df
        .select(col(scoreCol).cast("long").as("s"),
          when(label, 1L).otherwise(0L).as("y"))
        .groupBy("s")
        .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))),
      "averagePrecision.scoreCensus")
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    h.withColumn("tp", sum("pos").over(wDesc))
      .withColumn("fp", sum("neg").over(wDesc))
      .agg(sum(col("pos") + col("neg")).as("n"),
        sum("pos").as("n_pos"), count(lit(1)).as("n_thresholds"),
        // DECIMAL: Δtp·tp·10⁶ passes long range at ~10⁹ positives
        sum(expr("cast((cast(pos as decimal(38,0)) * tp * 1000000) " +
          "div (tp + fp) as long)")).as("num"))
      .select(col("n"), col("n_pos"), col("n_thresholds"),
        when(col("n_pos") > 0, expr("num div n_pos")).as("ap_ppm"))
  }

  /** Ranking-quality report per group: nDCG@k and MRR@k of a score
    * ranking against a binary relevance label — the retrieval-eval
    * completion of the q85 RRF ranker (a fused ranking is only as good
    * as its measured nDCG).
    *
    * Per group, items rank by (score DESC, id ASC) — a total order, so
    * both engines agree on every rank. The per-group top-k is a window
    * over group partitions (groups are the HIGH-cardinality axis —
    * the q07 shape, partitions balance); each kept row contributes
    * rel/log2(rank+1) in integer NANO, and the ideal DCG renormalizes
    * by ranking the group's relevant count first. MRR is the first
    * relevant rank's reciprocal in nano.
    *
    * Output per group: (group, n_items, n_relevant, dcg_nano,
    * idcg_nano, ndcg, mrr_nano).
    */
  /** Frozen nano discount table: round(10⁹/log₂(rank+1)), rank 1..k. */
  def discountNano(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.round(1e9 / (math.log(i + 1.0) / math.log(2.0))))

  def ndcgReport(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, label: Column, k: Int): DataFrame = {
    val w = Window.partitionBy("g")
      .orderBy(col("s").desc, col("id").asc)
    val ranked = df
      .select(col(groupCol).as("g"), col(scoreCol).cast("long").as("s"),
        col(idCol).as("id"), when(label, 1L).otherwise(0L).as("rel"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    // the 1/log2(rank+1) discounts are FROZEN nano literals shared with
    // the oracle (Benford-style): runtime log2 could differ in the last
    // ulp across engines and flip a rounding boundary
    val discounts = discountNano(k)
    val gainTable = array(discounts.map(lit): _*)
    val perGroup = ranked
      .withColumn("gain_nano",
        col("rel") * element_at(gainTable, col("rank")))
      .groupBy("g")
      .agg(count(lit(1)).as("n_items"), sum("rel").as("n_relevant"),
        sum("gain_nano").as("dcg_nano"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel_rank"))
    // ideal DCG: the group's n_relevant items ranked 1..min(n_rel, k)
    val ideal = (1 to k).map(i =>
      when(col("n_relevant") >= i, lit(discounts(i - 1))).otherwise(0L))
      .reduce(_ + _)
    perGroup
      .withColumn("idcg_nano", ideal)
      .withColumn("ndcg",
        when(col("idcg_nano") > 0, round(
          col("dcg_nano").cast("double") / col("idcg_nano"), 6)))
      .withColumn("mrr_nano",
        coalesce(round(lit(1e9) / col("first_rel_rank")).cast("long"),
          lit(0L)))
      .select(col("g").as(groupCol), col("n_items"), col("n_relevant"),
        col("dcg_nano"), col("idcg_nano"), col("ndcg"), col("mrr_nano"))
      .orderBy(groupCol)
  }

  /** Cohen's κ between two categorical labelings — chance-corrected
    * agreement, the annotator-quality / model-vs-gold readout plain
    * accuracy overstates when classes are imbalanced:
    * `κ = (p_o − p_e)/(1 − p_e)` with p_e the marginal-product chance
    * rate. κ ≈ 0 means the "agreement" is what guessing the base rates
    * gets you.
    *
    * The (a, b) label census is ONE aggregate; marginals re-aggregate
    * from it (stat grain, bounded by label vocabulary²); the chance
    * term Σ rowᵢ·colᵢ accumulates exactly in DECIMAL; κ is the one
    * rounded double. Output (ONE row): (n, n_agree, agree_ppm, kappa)
    * — κ NULL when p_e = 1 (both labelings constant).
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = graft.util.Caches.cached(
      df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c")))
    val ma = cells.groupBy("a").agg(sum("c").as("ra"))
    val mb = cells.groupBy("b").agg(sum("c").as("cb"))
    val chance = ma.join(mb, col("a") === col("b"))
      .agg(sum(col("ra").cast(dec) * col("cb")).as("pe_num"))
    val base = cells.agg(sum("c").as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L))
        .as("n_agree"))
    base.crossJoin(chance)
      .select(col("n"), col("n_agree"),
        expr("(n_agree * 1000000L) div n").as("agree_ppm"),
        when(col("n").cast(dec) * col("n") =!=
            coalesce(col("pe_num"), lit(0L).cast("decimal(38,0)")),
          round((col("n_agree").cast("double") * col("n") -
            coalesce(col("pe_num"), lit(0)).cast("double")) /
            (col("n").cast("double") * col("n") -
              coalesce(col("pe_num"), lit(0)).cast("double")), 6))
          .as("kappa"))
  }

  /** Split-conformal prediction interval per group — the
    * distribution-free "how wrong can this prediction be" guarantee
    * (public method: Vovk et al.; Angelopoulos & Bates 2021 tutorial
    * form): rows hash-split into a CALIBRATION and a TEST half; the
    * model is the calibration half's per-group mean; the interval
    * half-width is the ceil((n_cal+1)(1−α))-th smallest calibration
    * |residual| — and the guarantee says the test half's coverage is
    * ≥ 1−α in expectation, which the report verifies empirically.
    *
    * Everything is integer-exact: values quantize to micro, the group
    * mean is a floor division, residuals are integer micro, and the
    * order statistic comes from the house VALUE-DOMAIN census (a
    * cumulative window over DISTINCT residual values per group — the
    * q11 exact-median shape, never a corpus-row window on a
    * low-cardinality group key). The split is the deterministic
    * [[Sampling.idHash]] parity, reproducible verbatim in SQL.
    *
    * Output per group: (group, n_cal, n_test, mean_micro, qhat_micro,
    * covered, coverage_ppm) — a group with an empty calibration or
    * test half drops out (no interval to fit, or nothing to verify).
    */
  def conformalReport(df: DataFrame, groupCol: String, valCol: String,
      idCol: String, alphaPermille: Long = 100L): DataFrame = {
    require(alphaPermille > 0 && alphaPermille < 1000, "alpha in (0,1)")
    val base = graft.util.Caches.cached(df
      .select(col(groupCol).as("g"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"),
        (Sampling.idHash(col(idCol).cast("long")) % 2 === 0).as("cal")))
    val model = base.filter(col("cal"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_cal"), sum("vm").as("sv"))
      // sign split off before the floor division (house idiom, see
      // topEigenReport): Spark `div` truncates toward zero, DuckDB `//`
      // floors — they agree only on non-negative operands, and a group
      // whose calibration sum is negative would otherwise shift every
      // residual by one micro
      .select(col("g"), col("n_cal"),
        (signum(col("sv").cast("double")).cast("long") *
          expr("abs(sv) div n_cal")).as("mean_micro"))
    // calibration |residual| census: value-domain, cumulative pick of
    // the ceil((n_cal+1)(1-alpha))-th order statistic
    val resid = base.filter(col("cal"))
      .join(broadcast(model), Seq("g"))
      .select(col("g"), abs(col("vm") - col("mean_micro")).as("r"))
      .groupBy("g", "r").agg(count(lit(1)).as("c"))
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy("g").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, 0)
    val qhat = resid
      .withColumn("cum", sum("c").over(wCum))
      .join(broadcast(model.select("g", "n_cal")), Seq("g"))
      // rank = ceil((n_cal+1)(1000-alpha)/1000) via the positive-int
      // identity (a + b - 1) div b (no reliance on div's negative
      // rounding mode), clamped to n_cal
      .withColumn("rank",
        least(expr(s"((n_cal + 1) * (1000 - $alphaPermille) + 999) " +
          "div 1000"), col("n_cal")))
      .groupBy("g")
      .agg(min(when(col("cum") >= col("rank"), col("r"))).as("qhat_micro"))
    base.filter(!col("cal"))
      .join(broadcast(model), Seq("g"))
      .join(broadcast(qhat), Seq("g"))
      .groupBy(col("g"), col("n_cal"), col("mean_micro"),
        col("qhat_micro"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("vm") - col("mean_micro")) <= col("qhat_micro"),
          1L).otherwise(0L)).as("covered"))
      .select(col("g").as(groupCol), col("n_cal"), col("n_test"),
        col("mean_micro"), col("qhat_micro"), col("covered"),
        expr("(covered * 1000000L) div n_test").as("coverage_ppm"))
      .orderBy(groupCol)
  }

  /** ISOTONIC calibration (public method: pool-adjacent-violators,
    * Ayer et al. 1955; computed by the Robertson–Wright–Dykstra
    * minimax identity) — the monotone completion of
    * [[calibrationReport]]: the weighted L2-optimal NON-DECREASING
    * fit of the per-bin positive rate, i.e. the calibration map a
    * score column actually supports. The raw per-bin rate can zigzag
    * on noise; the isotonic fit is what a downstream thresholding
    * pass should consume.
    *
    * Instead of the sequential PAV stack (order-dependent, hostile to
    * both engines), the fit uses the exact minimax identity
    *
    *   iso_i = max_{j ≤ i} min_{k ≥ i} rate(j..k),
    *
    * where rate(j..k) is the POOLED rate over occupied bins j..k —
    * a (j,k) pair fan-out over the ≤nBins bin census (stat grain,
    * B² pairs, never touching data rows) with one suffix-min window
    * per j and one max per i. Pooled rates are exact floor-ppm from
    * prefix sums, so the oracle mirrors bit-for-bit; the quantization
    * to ppm happens per pooled average (documented — the fit is PAV
    * over the ppm grid). Binning is [[calibrationReport]]'s frozen
    * equal-width rule.
    *
    * Output per occupied bin: (bin, n_rows, n_pos, pos_rate_ppm,
    * iso_rate_ppm), bin-ordered; iso_rate_ppm is non-decreasing.
    */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
      label: Column, nBins: Int = 20): DataFrame = {
    val v = df.select(col(scoreCol).cast("long").as("s"),
      when(label, 1L).otherwise(0L).as("y"))
    val bounds = v.agg(min("s").as("mn"), max("s").as("mx"))
    val census = graft.util.Caches.cached(
      v.crossJoin(broadcast(bounds))
        .withColumn("bin",
          expr(s"((s - mn) * $nBins) div (mx - mn + 1)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_rows"), sum("y").as("n_pos")))
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pref = census
      .withColumn("cum_n", sum("n_rows").over(wCum))
      .withColumn("cum_p", sum("n_pos").over(wCum))
    val lo = pref.select(col("bin").as("j"),
      (col("cum_n") - col("n_rows")).as("n_before"),
      (col("cum_p") - col("n_pos")).as("p_before"))
    val hi = pref.select(col("bin").as("k"), col("cum_n"),
      col("cum_p"))
    // B² stat-grain pairs; both sides are the ≤nBins census
    val pairs = broadcast(lo).crossJoin(hi)
      .filter(col("j") <= col("k"))
      .withColumn("avg_ppm", expr(
        "((cum_p - p_before) * 1000000L) div (cum_n - n_before)"))
    val wSuffix = Window.partitionBy("j").orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val iso = pairs
      .withColumn("sm", min("avg_ppm").over(wSuffix))
      .groupBy(col("k").as("bin"))
      .agg(max("sm").as("iso_rate_ppm"))
    census.join(iso, Seq("bin"))
      .select(col("bin"), col("n_rows"), col("n_pos"),
        expr("(n_pos * 1000000L) div n_rows").as("pos_rate_ppm"),
        col("iso_rate_ppm"))
      .orderBy("bin")
  }

  /** SPLIT-CONFORMAL interval report (public method: Vovk's inductive
    * conformal prediction; Angelopoulos & Bates 2023 tutorial form) —
    * the distribution-free miscoverage guarantee a model-eval pipeline
    * should report INSTEAD of a hand-tuned tolerance: with calibration
    * nonconformity scores s = |y − ŷ| and q̂ = the k-th smallest where
    * k = ⌈(n_cal+1)(1−α)⌉, the interval ŷ ± q̂ covers a fresh point
    * with probability ≥ 1−α, no matter the model.
    *
    * Everything is exact: s are micro integers, k is one integer
    * ceiling ((n+1)·(1000−α‰) + 999) div 1000, q̂ the value-domain
    * order-statistic pick (min s with cum ≥ k — the q11 census pick),
    * and the held-out coverage a floor-ppm count. When k > n_cal the
    * conformal interval is infinite — q̂ and the coverage go NULL
    * rather than pretending a finite width (the honest small-n answer).
    *
    * Output (1 row): (n_cal, n_eval, qhat_micro, n_covered,
    * coverage_ppm, target_ppm).
    */
  def splitConformal(df: DataFrame, isCalib: Column, yMicro: Column,
      yhatMicro: Column, alphaPermille: Long = 100L): DataFrame = {
    require(alphaPermille > 0 && alphaPermille < 1000, "alpha in (0,1)")
    val base = graft.util.Caches.cached(df.select(isCalib.as("cal"),
      abs(yMicro - yhatMicro).cast("long").as("s")))
    // the nonconformity census rides micro-rounded |y − ŷ| — a domain
    // that grows with rows until saturation — so the cumulative count
    // and the calibration total come from the PrefixSum two-level scan
    // and a broadcast 1-row aggregate, never an unpartitioned window
    val census = graft.util.Caches.cached(base.filter(col("cal"))
      .groupBy("s").agg(count(lit(1)).as("c")))
    val nCal = census.agg(coalesce(sum("c"), lit(0L)).as("n_cal"))
    val q = PrefixSum
      .cumBefore(census, "s", "c", "__cb", "splitConformal")
      .withColumn("cum", col("__cb") + col("c"))
      .crossJoin(broadcast(nCal))
      .withColumn("k", expr(
        s"((n_cal + 1) * ${1000 - alphaPermille} + 999) div 1000"))
      .groupBy(col("n_cal"))
      .agg(min(when(col("cum") >= col("k"), col("s"))).as("qhat_micro"))
    // the q side collapses to ZERO rows when the calibration partition
    // is empty (empty census → empty groupBy), and a crossJoin against
    // an empty side vanishes — seed q back to exactly one row (n_cal=0,
    // NULL q̂) so the report honors its 1-row contract on degenerate
    // splits instead of returning an empty relation
    val qRow = df.sparkSession.range(1).select(lit(1).as("seed1"))
      .join(broadcast(q.withColumn("seed1", lit(1))), Seq("seed1"),
        "left")
      .select(coalesce(col("n_cal"), lit(0L)).as("n_cal"),
        col("qhat_micro"))
    val eval0 = base.filter(!col("cal"))
    // global (non-grouped) agg: one row even when the eval partition
    // is empty (n_eval = 0, NULL coverage)
    val cov = eval0
      .crossJoin(broadcast(qRow.select(col("qhat_micro").as("qh"))))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("s") <= col("qh"), 1L).otherwise(0L))
          .as("n_covered"))
    cov.crossJoin(broadcast(qRow))
      .select(col("n_cal"), col("n_eval"), col("qhat_micro"),
        when(col("qhat_micro").isNotNull && col("n_eval") > 0,
          col("n_covered")).as("n_covered"),
        when(col("qhat_micro").isNotNull && col("n_eval") > 0,
          expr("(n_covered * 1000000) div n_eval")).as("coverage_ppm"),
        lit((1000 - alphaPermille) * 1000).as("target_ppm"))
  }
}
