package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUPED variance-reduced experiment readout (Controlled-experiment
  * Using Pre-Experiment Data, Deng et al. 2013 — the industry-standard
  * A/B variance-reduction): each user's experiment-period metric y is
  * adjusted by their OWN pre-period metric x,
  * `y_adj = y − θ·(x − x̄)` with `θ = cov(x, y)/var(x)` fitted on the
  * pooled population, shrinking between-user variance without biasing
  * the treatment contrast (the adjustment is mean-zero by
  * construction).
  *
  * Exact cores: per-user milli-integer period sums in ONE conditional
  * aggregate (one scan, user-keyed — no per-period re-scan); the
  * pooled (n, Σx, Σy, Σxy, Σx²) stat row accumulates products in
  * DECIMAL(38,0) (the oracle's HUGEINT matches exactly); θ, the means
  * and the adjusted means derive from those integers with the
  * identical expression in SQL. Per-arm aggregation is stat grain; the
  * pooled row broadcasts. θ degrades to 0 on a constant covariate
  * (var(x) = 0 → no adjustment) rather than NULLing the readout.
  *
  * Output per arm: (arm, n_users, sum_y_milli, sum_x_milli,
  * mean_y_milli, adj_mean_y_milli, theta), arm-ordered.
  */
object Experiment {

  def cupedReport(events: DataFrame, prePred: Column, armExpr: Column,
      valCol: String = "value", userCol: String = "user_id"): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e3).cast("long")
    val perUser = events
      .groupBy(col(userCol).as("u"))
      .agg(sum(when(prePred, vm).otherwise(0L)).as("x"),
        sum(when(!prePred, vm).otherwise(0L)).as("y"))
    val pooled = perUser.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
    val varX = col("n").cast(dec) * col("sxx") -
      col("sx").cast(dec) * col("sx").cast(dec)
    val theta = pooled.select(col("n"), col("sx"),
      when(varX > 0,
        (col("n").cast(dec) * col("sxy") -
          col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
          varX.cast("double"))
        .otherwise(lit(0.0)).as("theta"))
    val arms = perUser
      .groupBy(armExpr.as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum("y").as("sum_y_milli"), sum("x").as("sum_x_milli"))
    val meanY = col("sum_y_milli").cast("double") / col("n_users")
    val meanX = col("sum_x_milli").cast("double") / col("n_users")
    val meanXAll = col("sx").cast("double") / col("n")
    arms.crossJoin(broadcast(theta))
      .select(col("arm"), col("n_users"), col("sum_y_milli"),
        col("sum_x_milli"),
        round(meanY, 6).as("mean_y_milli"),
        round(meanY - col("theta") * (meanX - meanXAll), 6)
          .as("adj_mean_y_milli"),
        round(col("theta"), 6).as("theta"))
      .orderBy("arm")
  }

  /** Two-sided α = 0.05 normal quantile, frozen as a shared literal
    * (the nDCG discount-table convention: no runtime distribution
    * inverse can flip a rounding boundary between engines).
    */
  val ZAlphaMicro = 1959964L
  /** 80%-power normal quantile, same convention. */
  val ZPowerMicro = 841621L

  /** Minimum detectable effect for a two-proportion test at the
    * CURRENT arm sizes — the design-side companion of [[proportionZ]]:
    * "with this much traffic, what conversion lift could we even
    * see?" `MDE = (z_{α/2} + z_{power})·√(2·p̂(1−p̂)/n̄_h)` with the
    * harmonic-mean arm size; z constants are frozen micro literals
    * shared verbatim with the oracle. Integer cores (arm sizes,
    * conversions); MDE the one double at 6 dp.
    *
    * Output (one row): (n_ctrl, n_treat, conv_ctrl, conv_treat,
    * baseline_ppm, mde_abs); NULL on empty arms or degenerate rates.
    */
  def mdeReport(units: DataFrame, armCol: String = "arm",
      successCol: String = "success"): DataFrame = {
    val s = units.agg(
      sum(when(col(armCol) === 0, 1L).otherwise(0L)).as("n_ctrl"),
      sum(when(col(armCol) === 0 && col(successCol), 1L).otherwise(0L))
        .as("conv_ctrl"),
      sum(when(col(armCol) === 1, 1L).otherwise(0L)).as("n_treat"),
      sum(when(col(armCol) === 1 && col(successCol), 1L).otherwise(0L))
        .as("conv_treat"))
    val pooled = (col("conv_ctrl") + col("conv_treat")).cast("double") /
      (col("n_ctrl") + col("n_treat"))
    val z = lit((ZAlphaMicro + ZPowerMicro).toDouble / 1e6)
    val mde = z * sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_ctrl") + lit(1.0) / col("n_treat")))
    s.select(col("n_ctrl"), col("n_treat"), col("conv_ctrl"),
      col("conv_treat"),
      expr("((conv_ctrl + conv_treat) * 1000000L) div (n_ctrl + n_treat)")
        .as("baseline_ppm"),
      when(col("n_ctrl") > 0 && col("n_treat") > 0 &&
          pooled > 0 && pooled < 1,
        round(mde, 6)).as("mde_abs"))
  }

  /** Difference-in-differences readout: the causal-contrast companion
    * of [[cupedReport]] for settings where BOTH arms existed before
    * the change — `DiD = (T_post − T_pre) − (C_post − C_pre)` nets out
    * arm-level baselines and shared time trends in one number.
    *
    * One scan, one conditional aggregate: the four (arm × period)
    * cells carry exact integer (n, Σmilli) cores, the four means and
    * the DiD derive identically in SQL at 6 dp. NULL when any cell is
    * empty.
    *
    * Output (one row): n/sum per cell (8 integer columns), the four
    * means, did_milli.
    */
  def didReport(events: DataFrame, armExpr: Column, prePred: Column,
      valCol: String = "value"): DataFrame = {
    val vm = round(col(valCol).cast("double") * 1e3).cast("long")
    def cell(arm: Int, pre: Boolean, suf: String) = {
      val in = armExpr === arm && (if (pre) prePred else !prePred)
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$suf"),
        sum(when(in, vm).otherwise(0L)).as(s"s_$suf"))
    }
    val agg = cell(0, pre = true, "c_pre") ++ cell(0, pre = false, "c_post") ++
      cell(1, pre = true, "t_pre") ++ cell(1, pre = false, "t_post")
    def mean(suf: String) =
      round(col(s"s_$suf").cast("double") / col(s"n_$suf"), 6)
    val ok = col("n_c_pre") > 0 && col("n_c_post") > 0 &&
      col("n_t_pre") > 0 && col("n_t_post") > 0
    events.agg(agg.head, agg.tail: _*)
      .select((Seq("c_pre", "c_post", "t_pre", "t_post")
        .flatMap(s => Seq(col(s"n_$s"), col(s"s_$s"))) ++
        Seq(when(ok, mean("c_pre")).as("mean_c_pre"),
          when(ok, mean("c_post")).as("mean_c_post"),
          when(ok, mean("t_pre")).as("mean_t_pre"),
          when(ok, mean("t_post")).as("mean_t_post"),
          when(ok, round(
            (col("s_t_post").cast("double") / col("n_t_post") -
              col("s_t_pre").cast("double") / col("n_t_pre")) -
              (col("s_c_post").cast("double") / col("n_c_post") -
                col("s_c_pre").cast("double") / col("n_c_pre")), 6))
            .as("did_milli"))): _*)
  }

  /** Two-proportion z-test with per-segment decomposition — the
    * binary-outcome readout completing the experiment family
    * ([[cupedReport]] reads means, [[covariateBalance]] gates the
    * randomization): conversion-rate difference per arm, overall AND
    * within each segment, so a Simpson's-paradox flip (overall winner
    * loses inside every segment) is visible in one table.
    *
    * Unit grain in, stat grain out: callers pass a per-UNIT relation
    * (one row per user) with arm / success / segment columns; the
    * operator emits the '__all' row plus one row per segment. Exact
    * integer cores (n, conversions per arm per segment); rates are ppm
    * floor divisions; the pooled-variance z is the one double, derived
    * identically in SQL: `z = (p₁−p₀)/√(p̂(1−p̂)(1/n₀+1/n₁))` with p̂
    * the pooled rate. NULL z on empty arms or degenerate pooled rates.
    *
    * Output: (segment, n_ctrl, conv_ctrl, n_treat, conv_treat,
    * rate_ctrl_ppm, rate_treat_ppm, diff_ppm, z), segment-ordered
    * (the pooled row rides as segment '__all').
    */
  def proportionZ(units: DataFrame, armCol: String = "arm",
      successCol: String = "success",
      segmentCol: String = "segment"): DataFrame = {
    val seg = units
      .select(col(segmentCol).cast("string").as("segment"),
        col(armCol).as("arm"),
        when(col(successCol), 1L).otherwise(0L).as("s"))
    val both = seg.unionByName(
      seg.withColumn("segment", lit("__all")))
    // Conditional sums straight off the unit rows (one shuffle, and a
    // segment missing an arm reports n = conv = 0 rather than NULL —
    // the max(when(...)) pivot form returned NULL there, diverging from
    // the oracle's CASE-sum and misreading as "no data at all").
    val p = both.groupBy("segment")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("arm") === 0, col("s")).otherwise(0L)).as("conv_ctrl"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 1, col("s")).otherwise(0L)).as("conv_treat"))
    val p0 = col("conv_ctrl").cast("double") / col("n_ctrl")
    val p1 = col("conv_treat").cast("double") / col("n_treat")
    val pooled = (col("conv_ctrl") + col("conv_treat")).cast("double") /
      (col("n_ctrl") + col("n_treat"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_ctrl") + lit(1.0) / col("n_treat")))
    // NULL rates (not a divide-by-zero error) for a zero-count arm —
    // possible now that a single-arm segment reports n = 0
    val rc = when(col("n_ctrl") > 0,
      expr("(conv_ctrl * 1000000L) div n_ctrl"))
    val rt = when(col("n_treat") > 0,
      expr("(conv_treat * 1000000L) div n_treat"))
    p.select(col("segment"), col("n_ctrl"), col("conv_ctrl"),
        col("n_treat"), col("conv_treat"),
        rc.as("rate_ctrl_ppm"), rt.as("rate_treat_ppm"),
        (rt - rc).as("diff_ppm"),
        when(col("n_ctrl") > 0 && col("n_treat") > 0 &&
            pooled > 0 && pooled < 1,
          round((p1 - p0) / se, 6)).as("z"))
      .orderBy("segment")
  }

  /** Covariate-balance audit between two experiment arms — the
    * pre-readout sanity check [[cupedReport]] assumes: per feature,
    * the standardized mean difference
    * `SMD = (m̄_treat − m̄_ctrl)/√((v_ctrl + v_treat)/2)`; |SMD| ≥ 0.1
    * is the conventional imbalance flag (a randomization bug, not a
    * treatment effect).
    *
    * Per-(unit, feature) milli sums off ONE scan; absent combinations
    * count as ZERO (a user who never purchased has zero purchase
    * spend — the full unit×feature grid is reconstituted from the
    * broadcast feature list, the chiSquare zero-cell move). Per-arm
    * sufficient statistics are exact integers (Σx² in DECIMAL ≡ oracle
    * HUGEINT); SMD and the flag derive identically in SQL.
    *
    * Output per feature: (feature, n_ctrl, n_treat, mean_ctrl_milli,
    * mean_treat_milli, smd, balanced); smd NULL when both variances
    * are 0.
    */
  def covariateBalance(events: DataFrame, armExpr: Column,
      featureCol: String = "event_type", valCol: String = "value",
      userCol: String = "user_id"): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e3).cast("long")
    // cached: units, features and the grid all re-enter this relation —
    // uncached each consumer re-scans the event log
    val sums = graft.util.Caches.cached(events
      .groupBy(col(userCol).as("u"), col(featureCol).as("ft"))
      .agg(sum(vm).as("v")))
    val units = sums.select("u").distinct()
    val features = sums.select("ft").distinct()
    val grid = units.crossJoin(broadcast(features))
      .join(sums, Seq("u", "ft"), "left")
      .na.fill(0L, Seq("v"))
      .withColumn("arm", armExpr)
    val byArm = grid.groupBy("ft", "arm")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("q"))
    def pick(a: Int, c: String) = max(when(col("arm") === a, col(c))).as(s"${c}$a")
    val p = byArm.groupBy("ft")
      .agg(pick(0, "n"), pick(0, "s"), pick(0, "q"),
        pick(1, "n"), pick(1, "s"), pick(1, "q"))
    def v(i: Int) = (col(s"n$i").cast(dec) * col(s"q$i") -
      col(s"s$i").cast(dec) * col(s"s$i").cast(dec)).cast("double") /
      (col(s"n$i").cast("double") * (col(s"n$i") - lit(1)))
    val pooled = (v(0) + v(1)) / lit(2.0)
    val smd = round((col("s1").cast("double") / col("n1") -
      col("s0").cast("double") / col("n0")) / sqrt(pooled), 6)
    p
      .withColumn("smd",
        when(col("n0") > 1 && col("n1") > 1 && pooled > 0, smd))
      .select(col("ft").as("feature"),
        col("n0").as("n_ctrl"), col("n1").as("n_treat"),
        round(col("s0").cast("double") / col("n0"), 6)
          .as("mean_ctrl_milli"),
        round(col("s1").cast("double") / col("n1"), 6)
          .as("mean_treat_milli"),
        col("smd"),
        when(col("smd").isNotNull, abs(col("smd")) < 0.1).as("balanced"))
      .orderBy("feature")
  }

  /** O'Brien–Fleming two-sided boundaries for 4 equally-spaced peeks at
    * overall α = 0.05, as micro literals FROZEN on both engines (the
    * MDE z-quantile convention): z_k = 2.024·√(4/k).
    */
  val ObfBoundaryMicro: Seq[Long] = Seq(4048000L, 2862368L, 2337114L, 2024000L)

  /** Group-sequential monitoring — "when could this test have stopped":
    * the peeking-correct companion of [[proportionZ]] (whose single z is
    * only valid if you look once). Units carry a peek index 1..4 (which
    * interim look they arrived before); at each look the CUMULATIVE
    * two-proportion z compares against the [[ObfBoundaryMicro]]
    * O'Brien–Fleming boundary — early looks demand ~4σ, the final look
    * ~2σ, holding overall α at 5% despite 4 looks.
    *
    * Scale shape: ONE conditional aggregate to 4 peek stat rows (map-
    * side partials); cumulative sums and the first-crossing argmin are
    * windows over those 4 rows, never over units. Integer cores; z is
    * the one rounded double, derived identically in SQL.
    *
    * Output per peek: (peek, n_ctrl, conv_ctrl, n_treat, conv_treat, z,
    * boundary_micro, crossed, first_cross_peek) — first_cross_peek is
    * the earliest crossed look (NULL if none), repeated on every row.
    */
  def groupSequentialZ(units: DataFrame, peekCol: String,
      armCol: String = "arm", successCol: String = "success"): DataFrame = {
    val perPeek = units
      .select(col(peekCol).cast("int").as("peek"), col(armCol).as("arm"),
        when(col(successCol), 1L).otherwise(0L).as("s"))
      .groupBy("peek")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("dn0"),
        sum(when(col("arm") === 0, col("s")).otherwise(0L)).as("dk0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("dn1"),
        sum(when(col("arm") === 1, col("s")).otherwise(0L)).as("dk1"))
    import org.apache.spark.sql.expressions.Window
    // 4 stat rows: every window below is bounded by the peek count
    val cum = Window.partitionBy().orderBy("peek")
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundary = ObfBoundaryMicro.zipWithIndex.foldLeft(lit(null): Column) {
      case (acc, (bm, i)) => when(col("peek") === i + 1, lit(bm)).otherwise(acc)
    }
    val p0 = col("conv_ctrl").cast("double") / col("n_ctrl")
    val p1 = col("conv_treat").cast("double") / col("n_treat")
    val pooled = (col("conv_ctrl") + col("conv_treat")).cast("double") /
      (col("n_ctrl") + col("n_treat"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_ctrl") + lit(1.0) / col("n_treat")))
    val z = when(col("n_ctrl") > 0 && col("n_treat") > 0 &&
      pooled > 0 && pooled < 1, round((p1 - p0) / se, 6))
    perPeek
      .select(col("peek"),
        sum("dn0").over(cum).as("n_ctrl"), sum("dk0").over(cum).as("conv_ctrl"),
        sum("dn1").over(cum).as("n_treat"), sum("dk1").over(cum).as("conv_treat"))
      .withColumn("z", z)
      .withColumn("boundary_micro", boundary)
      // integer-domain crossing test: |z| re-quantized to micro vs the
      // frozen boundary literal — no float >= at the decision boundary
      .withColumn("crossed", coalesce(
        round(abs(col("z")) * 1e6).cast("long") >= col("boundary_micro"),
        lit(false)))
      .withColumn("first_cross_peek",
        min(when(col("crossed"), col("peek")))
          .over(Window.partitionBy()).cast("int"))
      .orderBy("peek")
  }

  /** Uplift by score bin — "WHO responds to treatment": units carry a
    * targeting score (an integer, e.g. basis points) and the report
    * reads, per fixed-width score bin and cumulatively from the
    * highest bin down, how much better treated units convert than
    * control units. The cumulative column is the Qini-curve reading:
    * uplift if you treated only the top-scored slice.
    *
    * Binning is [[Evaluation.calibrationReport]]'s exact integer rule
    * (frozen from the corpus min/max — one broadcast stat row);
    * everything after the ONE conditional aggregate is windows over
    * ≤ nBins stat rows. Rates are ppm floor divisions; a bin missing
    * an arm reports zero counts and NULL rates (proportionZ's rule).
    *
    * Output per bin (bin DESC — highest scores first): (bin, n_ctrl,
    * conv_ctrl, n_treat, conv_treat, uplift_ppm, cum_n_treat,
    * cum_uplift_ppm).
    */
  def upliftByDecile(units: DataFrame, scoreCol: String,
      armCol: String = "arm", successCol: String = "success",
      nBins: Int = 10): DataFrame = {
    // cached: both the bounds row and the binning pass read it — one
    // source scan, not two
    val v = graft.util.Caches.cached(
      units.select(col(scoreCol).cast("long").as("sc"),
        col(armCol).as("arm"),
        when(col(successCol), 1L).otherwise(0L).as("s")))
    val bounds = v.agg(min("sc").as("mn"), max("sc").as("mx"))
    val binned = v.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"((sc - mn) * $nBins) div (mx - mn + 1)"))
      .groupBy("bin")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("arm") === 0, col("s")).otherwise(0L)).as("conv_ctrl"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 1, col("s")).otherwise(0L)).as("conv_treat"))
    import org.apache.spark.sql.expressions.Window
    // ≤ nBins stat rows: cumulative-from-top windows are bin-bounded
    val cumW = Window.partitionBy().orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    binned
      .withColumn("cum_n_ctrl", sum("n_ctrl").over(cumW))
      .withColumn("cum_k_ctrl", sum("conv_ctrl").over(cumW))
      .withColumn("cum_n_treat", sum("n_treat").over(cumW))
      .withColumn("cum_k_treat", sum("conv_treat").over(cumW))
      .select(col("bin"), col("n_ctrl"), col("conv_ctrl"),
        col("n_treat"), col("conv_treat"),
        (when(col("n_treat") > 0,
            expr("(conv_treat * 1000000L) div n_treat")) -
          when(col("n_ctrl") > 0,
            expr("(conv_ctrl * 1000000L) div n_ctrl"))).as("uplift_ppm"),
        col("cum_n_treat"),
        (when(col("cum_n_treat") > 0,
            expr("(cum_k_treat * 1000000L) div cum_n_treat")) -
          when(col("cum_n_ctrl") > 0,
            expr("(cum_k_ctrl * 1000000L) div cum_n_ctrl")))
          .as("cum_uplift_ppm"))
      .orderBy(col("bin").desc)
  }

  /** INVERSE-PROPENSITY-WEIGHTED ATE (public method: Horvitz &
    * Thompson 1952; Rosenbaum & Rubin 1983's propensity adjustment):
    * when assignment correlates with a covariate, the naive
    * treated-minus-control mean is confounded; IPW reweights each unit
    * by 1/P(its own arm | covariate bin), recovering the ATE under
    * ignorability-within-bins. The propensity model here is the
    * EMPIRICAL bin rate — exact integers, no fitted model.
    *
    * Exactness: outcomes quantize to micro; e_b = treated-rate micro
    * per bin; each unit contributes the integer
    * `±(y_micro·10⁶) div e` cell (truncating division — Spark `div` ≡
    * DuckDB `//`, measured, so negatives agree), the Σ is order-free,
    * and the final ATE is one more integer division. Degenerate bins
    * (all-treated or all-control — propensity 0 or 1) are EXCLUDED
    * with their units (positivity violation; n vs n_used shows how
    * much), the oracle applying the same rule.
    *
    * Output (1 row): (n, n_used, n_treated_used, ate_ipw_micro,
    * ate_naive_micro).
    */
  def ipwAte(df: DataFrame, treat: Column, outcome: Column,
      covariateBin: Column): DataFrame = {
    val base = graft.util.Caches.cached(df.select(
      covariateBin.as("b"),
      when(treat, 1L).otherwise(0L).as("t"),
      round(outcome.cast("double") * 1e6).cast("long").as("ym")))
    val bins = base.groupBy("b")
      .agg(count(lit(1)).as("n_b"), sum("t").as("nt_b"))
      .withColumn("e", expr("(nt_b * 1000000) div n_b"))
    val usable = bins.filter(col("e") > 0 && col("e") < 1000000)
      .select("b", "e")
    val cells = base.join(broadcast(usable), Seq("b"))
      .select(col("t"), col("ym"),
        when(col("t") === 1,
            expr("(cast(ym as decimal(38,0)) * 1000000) div e"))
          .otherwise(-expr("(cast(ym as decimal(38,0)) * 1000000) " +
            "div (1000000 - e)"))
          .as("cell"))
    val tot = base.agg(count(lit(1)).as("n"))
    cells.agg(count(lit(1)).as("n_used"), sum("t").as("n_treated_used"),
        sum("cell").as("sc"),
        sum(when(col("t") === 1, col("ym")).otherwise(0L)).as("syt"),
        sum(when(col("t") === 0, col("ym")).otherwise(0L)).as("syc"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("n_used"), col("n_treated_used"),
        expr("sc div n_used").as("ate_ipw_micro"),
        (expr("syt div n_treated_used") -
          expr("syc div (n_used - n_treated_used)"))
          .as("ate_naive_micro"))
  }

  /** COCHRAN–ARMITAGE trend test (public method: Cochran 1954;
    * Armitage 1955) — "does the positive rate TREND across ordered
    * groups": the dose-response reading the pairwise two-proportion z
    * (proportionZ) can't give, because it uses the group ORDER. Input
    * rows carry an integer group score t (the dose: a decile index, a
    * bucket bound) and a binary outcome.
    *
    * With per-group (n_g, r_g) and totals (N, R): the trend statistic
    * assembles from four exact integer sufficient statistics — Σt·n,
    * Σt·r, Σt²·n, all in DECIMAL — as
    *
    *   A   = N·Σt·r − R·Σt·n
    *   z   = A / sqrt( R·(N−R)·(N·Σt²·n − (Σt·n)²) / N )
    *
    * (the N-scaled form of the usual p̂(1−p̂) variance; only z is a
    * double, rounded at 6, NULL when the variance is 0 — one group or
    * an all/none outcome). Shape: one group census, one stat row.
    *
    * Output (1 row): (n, n_pos, n_groups, z_trend).
    */
  def cochranArmitage(df: DataFrame, scoreCol: String,
      label: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cen = df
      .select(col(scoreCol).cast("long").as("t"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_g"), sum("y").as("r_g"))
    cen.agg(
      sum("n_g").as("n"), sum("r_g").as("n_pos"),
      count(lit(1)).as("n_groups"),
      sum(expr(s"cast(t as $dec) * n_g")).as("stn"),
      sum(expr(s"cast(t as $dec) * r_g")).as("str"),
      sum(expr(s"cast(t as $dec) * t * n_g")).as("sttn"))
      .withColumn("a_num", expr(
        "cast(n as decimal(38,0)) * str - " +
          "cast(n_pos as decimal(38,0)) * stn"))
      .withColumn("var_num", expr(
        "cast(n_pos as decimal(38,0)) * (n - n_pos) * " +
          "(cast(n as decimal(38,0)) * sttn - stn * stn)"))
      .select(col("n"), col("n_pos"), col("n_groups"),
        when(col("var_num") > 0, round(
          col("a_num").cast("double") /
            sqrt(col("var_num").cast("double") /
              col("n").cast("double")), 6)).as("z_trend"))
  }

  /** MANTEL–HAENSZEL pooled odds ratio + the CMH test (public
    * methods: Mantel & Haenszel 1959; Cochran 1954) — the
    * Simpson's-paradox-proof effect readout: the exposure↔outcome
    * association pooled ACROSS strata, each stratum's 2×2 weighted by
    * its own size, so a confounder that varies by stratum can't
    * manufacture the marginal association (the companion to
    * [[proportionsByGroup]]'s Simpson decomposition, which can only
    * SHOW the reversal).
    *
    * Per stratum i with cells (a=exposed-pos, b=exposed-neg,
    * c=unexposed-pos, d=unexposed-neg), n_i = a+b+c+d:
    *
    *   OR_MH    = Σ a·d/n_i ÷ Σ b·c/n_i
    *   CMH χ²   = (|Σa − ΣE_i| − ½)² / ΣV_i,   E = (a+b)(a+c)/n,
    *              V = (a+b)(c+d)(a+c)(b+d)/(n²(n−1))
    *
    * The per-stratum fractions are floor-quantized to MICRO integers
    * (documented — both engines apply the identical `div`/`//`, so
    * the quantization is part of the operator's contract, the q210a
    * convention) and summed in DECIMAL; OR and χ² are the only
    * doubles, rounded at 6, NULL when the respective denominator is
    * 0. Single-group strata (no exposed or no unexposed rows)
    * contribute 0 to every sum, exactly as the formulas imply.
    * Shape: one stratum×cell census, one stat row out.
    *
    * Output (1 row): (n, n_strata, sum_a, or_mh, chi2_cmh).
    */
  /** WALD's SPRT (public method: Wald 1945) — the sequential
    * probability ratio test on a Bernoulli stream: monitor a success
    * rate EVENT BY EVENT and stop the moment the evidence crosses a
    * boundary, with α/β guaranteed by construction — the
    * always-monitoring sibling of the group-sequential look schedule
    * (q203), for the "did the error rate move" question nobody wants
    * to wait a day to answer.
    *
    * Per-event log-likelihood-ratio increments are the two constants
    * y·ln(p₁/p₀) + (1−y)·ln((1−p₁)/(1−p₀)); every ln is taken of an
    * INTEGER-valued double (ppm parameters) and nano-rounded, so the
    * cumulative path and both boundaries ln((1−β)/α), ln(β/(1−α))
    * are exact integers — first-crossing indices are exact row
    * numbers, cross-engine. One ordered window per group (groups are
    * the high-cardinality axis).
    *
    * Output per group: (group, n, n_pos, llr_final_nano, decision ∈
    * h1/h0/none, n_at_decision).
    */
  def sprtReport(df: DataFrame, groupCol: String, orderCols: Seq[String],
      success: Column, p0Ppm: Long, p1Ppm: Long, alphaPpm: Long,
      betaPpm: Long): DataFrame = {
    require(p0Ppm > 0 && p1Ppm > 0 && p0Ppm < 1000000L &&
      p1Ppm < 1000000L && p0Ppm != p1Ppm, "ppm rates in (0,1e6)")
    require(alphaPpm > 0 && betaPpm > 0 && alphaPpm < 1000000L &&
      betaPpm < 1000000L, "ppm errors in (0,1e6)")
    def lnNano(x: Double): Long = math.round(math.log(x) * 1e9)
    val posInc = lnNano(p1Ppm.toDouble) - lnNano(p0Ppm.toDouble)
    val negInc = lnNano(1e6 - p1Ppm) - lnNano(1e6 - p0Ppm)
    val upper = lnNano(1e6 - betaPpm) - lnNano(alphaPpm.toDouble)
    val lower = lnNano(betaPpm.toDouble) - lnNano(1e6 - alphaPpm)
    val w = Window.partitionBy("g")
      .orderBy(orderCols.map(col): _*)
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    val path = df
      .select((col(groupCol).as("g") +:
        when(success, 1L).otherwise(0L).as("y") +:
        orderCols.map(col)): _*)
      .withColumn("rn", row_number().over(w))
      .withColumn("llr", sum(
        when(col("y") === 1L, posInc).otherwise(negInc)).over(wCum))
    path.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        min(when(col("llr") >= upper, col("rn"))).as("first_h1"),
        min(when(col("llr") <= lower, col("rn"))).as("first_h0"))
      .select(col("g").as(groupCol), col("n"), col("n_pos"),
        // the path ends at posInc·n_pos + negInc·(n − n_pos) exactly
        (lit(posInc) * col("n_pos") +
          lit(negInc) * (col("n") - col("n_pos")))
          .as("llr_final_nano"),
        when(col("first_h1").isNotNull &&
          (col("first_h0").isNull ||
            col("first_h1") <= col("first_h0")), "h1")
          .when(col("first_h0").isNotNull, "h0")
          .otherwise("none").as("decision"),
        // least() skips NULLs on both engines (the Postgres rule)
        least(col("first_h1"), col("first_h0")).as("n_at_decision"))
      .orderBy(groupCol)
  }

  def mantelHaenszel(df: DataFrame, stratumCol: String,
      exposure: Column, outcome: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .select(col(stratumCol).as("s"),
        when(exposure, 1L).otherwise(0L).as("e"),
        when(outcome, 1L).otherwise(0L).as("y"))
      .groupBy("s")
      .agg(sum(expr("e * y")).as("a"),
        sum(expr("e * (1 - y)")).as("b"),
        sum(expr("(1 - e) * y")).as("c"),
        sum(expr("(1 - e) * (1 - y)")).as("d"))
      .withColumn("n_i", expr("a + b + c + d"))
    cells.agg(
      sum("n_i").as("n"), count(lit(1)).as("n_strata"),
      sum("a").as("sum_a"),
      sum(expr(s"(cast(a as $dec) * d * 1000000) div n_i"))
        .as("r_micro"),
      sum(expr(s"(cast(b as $dec) * c * 1000000) div n_i"))
        .as("s_micro"),
      sum(expr(s"(cast(a + b as $dec) * (a + c) * 1000000) div n_i"))
        .as("e_micro"),
      sum(expr(s"case when n_i > 1 then (cast(a + b as $dec) * " +
        "(c + d) * (a + c) * (b + d) * 1000000) div " +
        s"(cast(n_i as $dec) * n_i * (n_i - 1)) else cast(0 as $dec) " +
        "end")).as("v_micro"))
      .select(col("n"), col("n_strata"), col("sum_a"),
        when(col("s_micro") > 0, round(
          col("r_micro").cast("double") /
            col("s_micro").cast("double"), 6)).as("or_mh"),
        when(col("v_micro") > 0, round(
          (abs(col("sum_a").cast("double") -
            col("e_micro").cast("double") / lit(1e6)) - lit(0.5)) *
            (abs(col("sum_a").cast("double") -
              col("e_micro").cast("double") / lit(1e6)) - lit(0.5)) /
            (col("v_micro").cast("double") / lit(1e6)), 6))
          .as("chi2_cmh"))
  }
}
