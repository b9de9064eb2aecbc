package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation matrix over numeric columns — the
  * multi-column dependence half of the profiling family (the reference
  * profiles columns independently; any feature-engineering pass over the
  * same tables needs the cross-column view).
  *
  * Scale shape: ONE scan, ONE aggregate row. Every value quantizes to
  * integer micro-units at the scan; all sufficient statistics — n, and
  * per pair Σx, Σy, Σxy, Σx², Σy² — accumulate as DECIMAL(38,0), so
  * each is an EXACT integer sum, order-independent and cross-engine
  * bit-identical (the oracle accumulates the same integers in HUGEINT).
  * The C·(C−1)/2 output rows explode from a literal struct array over
  * the single stat row — the pair fan-out never touches the data scan,
  * and the plan has exactly one Aggregate (PlanSpec-gated).
  *
  * The final r = (n·Σxy − Σx·Σy) / √((n·Σx²−Σx²ᵗᵒᵗ)(n·Σy²−Σy²ᵗᵒᵗ))
  * converts each exact integer factor to double (deterministic IEEE
  * round-to-nearest on both engines), multiplies the two variance terms
  * in double (their exact product can exceed 128 bits), and rounds at
  * 6 dp.
  *
  * Headroom: with micro (1e-6) quantization, n·Σx² stays inside
  * DECIMAL(38) while n·x²·10¹² < 10³⁸ — e.g. 10¹² rows of values up to
  * ~10⁴. Callers correlating larger magnitudes at extreme row counts
  * pass a coarser `quantScale`; [[pearsonMatrixApprox]] is the
  * sketch-free double-precision fallback (Spark's `corr`, order-
  * dependent in the last ulps, spec-compared within 1e-9).
  */
object Correlate {

  /** (col_x, col_y, n, r) for every unordered column pair, r at 6 dp. */
  def pearsonMatrix(df: DataFrame, cols: Seq[String],
      quantScale: Double = 1e6): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val dec = "decimal(38,0)"
    def m(c: String) = col(s"m_$c")
    val base = df.select(cols.map(c =>
      round(col(c).cast("double") * quantScale).cast("long").cast(dec)
        .as(s"m_$c")): _*)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = (count(lit(1)).cast("long").as("n") +:
      cols.flatMap(c => Seq(
        sum(m(c)).as(s"s_$c"),
        sum(m(c) * m(c)).as(s"ss_$c")))) ++
      pairs.map { case (a, b) => sum(m(a) * m(b)).as(s"sp_${a}_${b}") }
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val pairRows = pairs.map { case (a, b) =>
      val n = col("n").cast(dec)
      val num = (n * col(s"sp_${a}_${b}") - col(s"s_$a") * col(s"s_$b"))
        .cast("double")
      val dx = (n * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a"))
        .cast("double")
      val dy = (n * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
        .cast("double")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        col("n").as("n"),
        when(dx > 0 && dy > 0, round(num / sqrt(dx * dy), 6)).as("r"))
    }
    stats
      .select(explode(array(pairRows: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.n"), col("p.r"))
      .orderBy("col_x", "col_y")
  }

  /** Mutual information between two categorical columns — the
    * categorical sibling of [[pearsonMatrix]] (Pearson sees nothing in
    * nominal data; MI is the standard dependence measure for
    * source↔language / domain↔label audits and feature selection).
    *
    * Shape: ONE scan to the (a, b) contingency census; marginals and the
    * grand total ride windows over those STAT rows (|A|·|B| of them),
    * never the data — the q128 move. Each cell's contribution
    * (n_ab/n)·ln(n·n_ab / (n_a·n_b)) is rounded to integer NANO-nats
    * BEFORE the total (the q87 KL convention: the Σ of integers is
    * order-independent, so the report is hash-exact cross-engine).
    *
    * Output: one row per observed cell — (a, b, n_ab, contrib_nano) plus
    * the shared `mi_nano` total (Σ over all cells, ≥ 0 up to the per-cell
    * rounding) carried on every row.
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val wa = Window.partitionBy("a")
    val wb = Window.partitionBy("b")
    val wAll = Window.partitionBy()
    val contrib = round(
      (col("n_ab").cast("double") / col("n")) *
        log(col("n").cast("double") * col("n_ab") /
          (col("n_a").cast("double") * col("n_b"))) * lit(1e9))
      .cast("long")
    cells
      .withColumn("n_a", sum("n_ab").over(wa))
      .withColumn("n_b", sum("n_ab").over(wb))
      .withColumn("n", sum("n_ab").over(wAll))
      .withColumn("contrib_nano", contrib)
      .withColumn("mi_nano", sum("contrib_nano").over(wAll))
      .select(col("a").as(aCol), col("b").as(bCol), col("n_ab"),
        col("contrib_nano"), col("mi_nano"))
      .orderBy(aCol, bCol)
  }

  /** Pearson chi-square independence test + Cramér's V between two
    * categorical columns — the significance-flavored sibling of
    * [[mutualInformation]] (MI measures dependence strength in nats;
    * chi-square is what a data-quality gate thresholds: "did the
    * source×language mix shift beyond chance?").
    *
    * Unlike MI, chi-square needs the ZERO cells (an absent (a,b) combo
    * still contributes its expectation E = n_a·n_b/n), so the full grid
    * is reconstituted by crossing the two marginal relations — stat-grain
    * |A|×|B| rows off ONE corpus scan (the contingency census is cached;
    * marginals derive from it, never from the data).
    *
    * Integer core: per cell `chi_num = n·n_ab − n_a·n_b` (exact BIGINT;
    * |chi_num| ≤ n², inside long through n ≈ 3·10⁹ — beyond that pass a
    * pre-aggregated census and widen to decimal) and
    * `contrib_nano = round(chi_num²/(n·n_a·n_b)·10⁹)` — the cell value
    * (O−E)²/E cleared of denominators, both factors converted once to
    * double (deterministic IEEE on both engines). The total rides a
    * window over the grid's stat rows; |A|/|B| fall out of the SAME
    * windows (the grid is a full cross, so a per-`b` row count IS |A|).
    *
    * Output: one row per grid cell — (a, b, n_ab, n_a, n_b, chi_num,
    * contrib_nano) plus the shared chi2_nano total, degrees of freedom
    * (|A|−1)(|B|−1), and Cramér's V = √(χ²/(n·min(|A|−1,|B|−1))) at 6 dp.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = graft.util.Caches.cached(
      df.select(col(aCol).as("a"), col(bCol).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab")))
    val ma = cells.groupBy("a").agg(sum("n_ab").as("n_a"))
    val mb = cells.groupBy("b").agg(sum("n_ab").as("n_b"))
    val grid = ma.crossJoin(broadcast(mb))
      .join(broadcast(cells), Seq("a", "b"), "left")
      .na.fill(0L, Seq("n_ab"))
    val wAll = Window.partitionBy()
    val chiNum = col("n") * col("n_ab") - col("n_a") * col("n_b")
    val contrib = round(
      (chiNum.cast("double") * chiNum.cast("double")) /
        (col("n").cast("double") * col("n_a") * col("n_b")) * lit(1e9))
      .cast("long")
    grid
      .withColumn("n", sum("n_ab").over(wAll))
      .withColumn("n_levels_a", count(lit(1)).over(Window.partitionBy("b")))
      .withColumn("n_levels_b", count(lit(1)).over(Window.partitionBy("a")))
      .withColumn("chi_num", chiNum)
      .withColumn("contrib_nano", contrib)
      .withColumn("chi2_nano", sum("contrib_nano").over(wAll))
      .withColumn("dof",
        (col("n_levels_a") - 1) * (col("n_levels_b") - 1))
      .withColumn("cramers_v",
        when(col("dof") > 0 && col("n") > 0, round(
          sqrt((col("chi2_nano").cast("double") / 1e9) /
            (col("n").cast("double") *
              least(col("n_levels_a") - 1, col("n_levels_b") - 1))), 6)))
      .select(col("a").as(aCol), col("b").as(bCol), col("n_ab"),
        col("n_a"), col("n_b"), col("chi_num"), col("contrib_nano"),
        col("chi2_nano"), col("dof"), col("cramers_v"))
      .orderBy(aCol, bCol)
  }

  /** One-way ANOVA F — the numeric×categorical dependence test closing
    * the family: [[pearsonMatrix]] (numeric×numeric),
    * [[mutualInformation]]/[[chiSquare]] (categorical×categorical), and
    * this (does the group mean of a numeric signal differ across
    * sources/labels beyond chance?).
    *
    * ONE scan into per-group integer sufficient statistics (n_g, Σy,
    * Σy² with y in MILLI units — the square needs the headroom: milli
    * keeps n·Σy² inside DECIMAL(38,0) to 10¹² rows of values ≤ 10⁴);
    * everything after is windows over the G stat rows. Per-group
    * within/between contributions are cleared of denominators as exact
    * decimals, rounded to integer milli² BEFORE totalling (the MI/chi²
    * convention — integer sums are combine-order-free, so the report is
    * hash-exact even though group count and aggregation order vary):
    * `ssw_g = round((n_g·Σy² − (Σy)²)/n_g)`,
    * `ssb_g = round((Σy·N − S·n_g)²/(n_g·N²))`.
    *
    * Output per group: (g, n_g, s_milli, ssw_milli2, ssb_milli2) plus
    * the shared totals, degrees of freedom (k−1, N−k) and
    * F = (ssb/df1)/(ssw/df2) at 6 dp.
    */
  def anovaF(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e3).cast("long")
    val g = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_g"), sum(vm).as("s_g"),
        sum((vm.cast(dec)) * vm.cast(dec)).as("ssq_g"))
    val wAll = Window.partitionBy()
    val withTot = g
      .withColumn("n_all", sum("n_g").over(wAll))
      .withColumn("s_all", sum("s_g").over(wAll))
      .withColumn("k", count(lit(1)).over(wAll))
    val wNum = col("n_g").cast(dec) * col("ssq_g") -
      col("s_g").cast(dec) * col("s_g").cast(dec)
    val bNum = (col("s_g").cast(dec) * col("n_all") -
      col("s_all").cast(dec) * col("n_g"))
    val withContrib = withTot
      .withColumn("ssw_milli2",
        round(wNum.cast("double") / col("n_g")).cast("long"))
      .withColumn("ssb_milli2",
        round((bNum * bNum).cast("double") /
          (col("n_g").cast("double") * col("n_all") * col("n_all")))
          .cast("long"))
    withContrib
      .withColumn("ssw_total", sum("ssw_milli2").over(wAll))
      .withColumn("ssb_total", sum("ssb_milli2").over(wAll))
      .withColumn("df1", col("k") - 1)
      .withColumn("df2", col("n_all") - col("k"))
      .withColumn("f_stat",
        when(col("df1") > 0 && col("df2") > 0 && col("ssw_total") > 0,
          round((col("ssb_total").cast("double") / col("df1")) /
            (col("ssw_total").cast("double") / col("df2")), 6)))
      .select(col("g").as(groupCol), col("n_g"), col("s_g").as("s_milli"),
        col("ssw_milli2"), col("ssb_milli2"), col("ssw_total"),
        col("ssb_total"), col("df1"), col("df2"), col("f_stat"))
      .orderBy(groupCol)
  }

  /** Information gain of each candidate feature w.r.t. a label —
    * feature selection's workhorse ranking: IG(X) = H(Y) − H(Y|X),
    * computed for MANY features in ONE corpus scan (features melt into
    * (feature, x, y) rows at scan stage — an F× row fan that partial
    * aggregation collapses to the census before any exchange).
    *
    * Entropies follow the nano-nat convention: each census cell's
    * contribution — (n_xy/N)·ln(n_x/n_xy) for the conditional,
    * (n_y/N)·ln(N/n_y) for the label marginal — rounds to integer
    * nano-nats BEFORE its sum, so totals are combine-order-free and
    * hash-exact. H(Y) is recomputed per feature from that feature's own
    * census marginal (identical value; keeps each output row
    * self-contained).
    *
    * Output per feature: (feature, n_levels, n, h_label_nano,
    * h_cond_nano, ig_nano), feature-ordered.
    */
  def informationGain(df: DataFrame, featureCols: Seq[String],
      label: Column): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    val stacked = df.select(explode(array(featureCols.map(f =>
      struct(lit(f).as("feature"), col(f).cast("string").as("x"))): _*))
      .as("fx"), label.as("y"))
      .select(col("fx.feature").as("feature"), col("fx.x"), col("y"))
    val census = graft.util.Caches.cached(
      stacked.groupBy("feature", "x", "y").agg(count(lit(1)).as("n_xy")))
    val wf = Window.partitionBy("feature")
    val condCells = census
      .withColumn("n_x", sum("n_xy").over(Window.partitionBy("feature", "x")))
      .withColumn("n", sum("n_xy").over(wf))
      .withColumn("cell_nano", round(
        (col("n_xy").cast("double") / col("n")) *
          log(col("n_x").cast("double") / col("n_xy")) * lit(1e9))
        .cast("long"))
    val cond = condCells.groupBy("feature")
      .agg(count_distinct(col("x")).as("n_levels"), max("n").as("n"),
        sum("cell_nano").as("h_cond_nano"))
    val labelCells = census.groupBy("feature", "y")
      .agg(sum("n_xy").as("n_y"))
      .withColumn("n", sum("n_y").over(wf))
      .withColumn("cell_nano", round(
        (col("n_y").cast("double") / col("n")) *
          log(col("n").cast("double") / col("n_y")) * lit(1e9))
        .cast("long"))
    val hl = labelCells.groupBy("feature")
      .agg(sum("cell_nano").as("h_label_nano"))
    cond.join(hl, Seq("feature"))
      .withColumn("ig_nano", col("h_label_nano") - col("h_cond_nano"))
      .select("feature", "n_levels", "n", "h_label_nano", "h_cond_nano",
        "ig_nano")
      .orderBy("feature")
  }

  /** Pairwise Welch post-hoc matrix — the follow-up [[anovaF]] calls
    * for: the F test says "SOME group mean differs"; this table says
    * WHICH pairs, with an unequal-variance t per (g₁ < g₂) pair.
    * Shares [[graft.operators.ProfileDrift.welchTReport]]'s exact
    * conventions (milli quantization, DECIMAL Σx² ≡ HUGEINT, per-group
    * variance rounded to integer milli² BEFORE the t), so the whole
    * matrix derives from ONE scan's G stat rows — the pair stage is a
    * G×G stat self-join, never a data join.
    *
    * Output: (group_a, group_b, n_a, n_b, v_a_milli2, v_b_milli2,
    * t_stat, df_w), pair-ordered; t/df NULL under the welch guards.
    */
  def pairwiseWelch(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e3).cast("long")
    val g = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(vm).as("s"),
        sum(vm.cast(dec) * vm.cast(dec)).as("q"))
      .withColumn("v", when(col("n") > 1, round(
        (col("n").cast(dec) * col("q") -
          col("s").cast(dec) * col("s").cast(dec)).cast("double") /
          (col("n").cast("double") * (col("n") - lit(1))))
        .cast("long")))
    val pairs = g.select(col("g").as("group_a"), col("n").as("n_a"),
        col("s").as("s_a"), col("v").as("v_a_milli2"))
      .join(g.select(col("g").as("group_b"), col("n").as("n_b"),
        col("s").as("s_b"), col("v").as("v_b_milli2")),
        col("group_a") < col("group_b"))
    val se1 = col("v_a_milli2").cast("double") / col("n_a")
    val se2 = col("v_b_milli2").cast("double") / col("n_b")
    val se = se1 + se2
    val ok = col("n_a") > 1 && col("n_b") > 1 && se > 0
    pairs
      .withColumn("t_stat", when(ok, round(
        (col("s_a").cast("double") / col("n_a") -
          col("s_b").cast("double") / col("n_b")) / sqrt(se), 6)))
      .withColumn("df_w", when(ok, round(
        (se * se) / ((se1 * se1) / (col("n_a") - lit(1)) +
          (se2 * se2) / (col("n_b") - lit(1))), 3)))
      .select("group_a", "group_b", "n_a", "n_b",
        "v_a_milli2", "v_b_milli2", "t_stat", "df_w")
      .orderBy("group_a", "group_b")
  }

  /** Decision-stump threshold search: the best single split `v ≤ t` of
    * a numeric feature against a binary label, scored by information
    * gain — [[informationGain]] ranks features as-is; this finds WHERE
    * a numeric feature separates the classes (the quality-filter
    * threshold a pipeline then deploys, and the root-node computation
    * of any tree learner).
    *
    * Every distinct feature value is a candidate threshold. From the
    * per-(value, label) census, cumulative label counts give each
    * candidate's four split cells in O(1); each cell contributes
    * `(c/N)·ln(n_side/c)` nano-nats rounded BEFORE the sum (the q152
    * convention, zero cells contribute 0), so every candidate's
    * conditional entropy is an exact integer and the argmax is
    * deterministic (max gain, then SMALLEST threshold — the house
    * first-argmax rule). Windows run over the distinct-value census
    * only; one scan.
    *
    * Output (one row): (n, n_pos, h_label_nano, best_threshold_micro,
    * h_cond_nano, ig_nano). A CONSTANT feature has no candidate that
    * splits both sides non-empty, so the result is EMPTY (zero rows,
    * matching the SQL oracle) — callers wanting label stats even for a
    * constant feature should aggregate the label column directly.
    */
  def bestSplit(df: DataFrame, featureCol: String,
      label: Column): DataFrame = {
    // candidate-threshold census: value-bounded for bounded features
    // (doc lengths), so it rides unpartitioned cumulative windows —
    // the in-plan ceiling guard fails loudly if a continuous feature
    // drifts the census to corpus grain
    val census = graft.util.Guards.boundedCensus(
      graft.util.Caches.cached(df
        .select(round(col(featureCol).cast("double") * 1e6).cast("long")
          .as("vm"),
          when(label, 1L).otherwise(0L).as("y"))
        .groupBy("vm")
        .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("c1"),
          sum(when(col("y") === 0, 1L).otherwise(0L)).as("c0"))),
      "bestSplit.thresholdCensus")
    val wAll = Window.partitionBy()
    val wCum = wAll.orderBy("vm").rowsBetween(Window.unboundedPreceding, 0)
    def cell(c: Column, nSide: Column, n: Column): Column =
      when(c > 0, round((c.cast("double") / n) *
        log(nSide.cast("double") / c) * lit(1e9)).cast("long"))
        .otherwise(lit(0L))
    val cums = census
      .withColumn("cum1", sum("c1").over(wCum))
      .withColumn("cum0", sum("c0").over(wCum))
      .withColumn("n1", sum("c1").over(wAll))
      .withColumn("n0", sum("c0").over(wAll))
      .withColumn("n", col("n1") + col("n0"))
      .withColumn("nl", col("cum1") + col("cum0"))
      .withColumn("nr", col("n") - col("nl"))
      .filter(col("nr") > 0) // the top value splits nothing off
      .withColumn("h_cond_nano",
        cell(col("cum1"), col("nl"), col("n")) +
          cell(col("cum0"), col("nl"), col("n")) +
          cell(col("n1") - col("cum1"), col("nr"), col("n")) +
          cell(col("n0") - col("cum0"), col("nr"), col("n")))
    val hLabel = cell(col("n1"), col("n"), col("n")) +
      cell(col("n0"), col("n"), col("n"))
    val best = cums
      .withColumn("h_label_nano", hLabel)
      .withColumn("ig_nano", col("h_label_nano") - col("h_cond_nano"))
      .withColumn("best_ig", max("ig_nano").over(wAll))
      .filter(col("ig_nano") === col("best_ig"))
      .groupBy("n", "n1", "h_label_nano", "best_ig")
      .agg(min("vm").as("best_threshold_micro"))
    best.select(col("n"), col("n1").as("n_pos"), col("h_label_nano"),
      col("best_threshold_micro"),
      (col("h_label_nano") - col("best_ig")).as("h_cond_nano"),
      col("best_ig").as("ig_nano"))
  }

  /** Kendall's τ-b rank correlation between two integer-valued columns —
    * the tie-corrected, outlier-immune dependence measure completing
    * the numeric axis (Pearson sees linearity; τ sees any monotone
    * relation, and document metrics are full of ties).
    *
    * Entirely VALUE-DOMAIN: the (x, y) cell census collapses the corpus
    * (cells ≤ distinct value combinations), then the concordance sum
    * runs over CELL pairs — `cd2 = Σ_{a≠b} sign(xₐ−x_b)·sign(yₐ−y_b)·
    * cₐ·c_b = 2(C−D)`, an exact integer in the house doubled
    * convention (each unordered pair counted twice — no halving, no
    * fractions). Tie terms n1₂ = Σₓ tₓ(tₓ−1), n2₂ likewise come from
    * the marginal censuses; τ-b = cd2 / √((n0₂−n1₂)·(n0₂−n2₂)) at 6 dp
    * with n0₂ = n(n−1).
    *
    * The cell self-join broadcasts one side — fine while distinct
    * combinations stay in the 10⁵ range (true for bounded metrics like
    * lengths/counts; re-bucket wider domains first).
    */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = graft.util.Caches.cached(
      df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("c")))
    val cd = cells.as("a").crossJoin(broadcast(cells.as("b")))
      .filter(col("a.x") =!= col("b.x") || col("a.y") =!= col("b.y"))
      .agg(sum(
        signum(col("a.x") - col("b.x")).cast("long") *
          signum(col("a.y") - col("b.y")).cast("long") *
          col("a.c") * col("b.c")).as("cd2"))
    val stats = cells.agg(
      sum("c").as("n"), count(lit(1)).as("n_cells"))
    val tx = cells.groupBy("x").agg(sum("c").as("t"))
      .agg(sum(col("t") * (col("t") - 1)).as("n1_2"))
    val ty = cells.groupBy("y").agg(sum("c").as("t"))
      .agg(sum(col("t") * (col("t") - 1)).as("n2_2"))
    stats.crossJoin(cd).crossJoin(tx).crossJoin(ty)
      .withColumn("n0_2", col("n") * (col("n") - 1))
      .na.fill(0L, Seq("cd2"))
      .withColumn("tau_b",
        when(col("n0_2") > col("n1_2") && col("n0_2") > col("n2_2"),
          round(col("cd2").cast("double") /
            sqrt((col("n0_2") - col("n1_2")).cast("double") *
              (col("n0_2") - col("n2_2")).cast("double")), 6)))
      .select("n", "n_cells", "cd2", "n0_2", "n1_2", "n2_2", "tau_b")
  }

  /** Spearman rank correlation with tie-averaged ranks — the monotone
    * dependence measure between [[pearsonMatrix]] (linear) and
    * [[kendallTauB]] (pairwise): Pearson over the rank variables.
    * Ranks derive from the per-value censuses (average rank of a tied
    * run = cum_before + (t+1)/2 — kept integer as the DOUBLED rank
    * 2·cum_before + t + 1) — but the censuses are ENTITY-DERIVED when
    * the inputs are per-entity totals, so cum_before comes from the
    * [[PrefixSum]] two-level scan, not an unpartitioned window; weights
    * re-enter through the (x, y) cell census, and all five Pearson
    * sufficient sums accumulate exactly in DECIMAL(38,0). ρ is the one
    * closed-form double off those exact integers (rank products reach
    * ~4n³, inside DECIMAL to ~10¹¹ rows; the FINAL products n·Σ go
    * through doubles, not decimals, to dodge the n⁵ overflow).
    *
    * Output (ONE row): (n, n_cells, rho) — rho NULL when either
    * variable is constant.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = graft.util.Caches.cached(
      df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("c")))
    // the value censuses here are ENTITY-DERIVED (e.g. per-user spend
    // totals — distinct values grow with the population), so the
    // cumulative rank runs on the PrefixSum scan, never an
    // unpartitioned window. Both variables' censuses MELT into one
    // tagged relation so the scan's probing action runs ONCE
    // (round-13: the per-call fixed cost q217 paid per variable)
    val byVal = cells
      .select(explode(map(lit("x"), col("x"), lit("y"), col("y")))
        .as(Seq("vc", "v")), col("c"))
      .groupBy("vc", "v").agg(sum("c").as("t"))
    val ranked = PrefixSum
      .cumBeforeBy(byVal, Seq("vc"), "v", "t", "__cb", "spearman.ranks")
      .withColumn("r2", col("__cb") * 2 + col("t") + 1)
      .select(col("vc"), col("v"), col("r2"))
    def ranks(vc: String) = ranked.filter(col("vc") === vc)
      .select(col("v").as(vc), col("r2"))
    val j = cells
      .join(ranks("x").withColumnRenamed("r2", "rx2"), Seq("x"))
      .join(ranks("y").withColumnRenamed("r2", "ry2"), Seq("y"))
    val s = j.agg(sum("c").as("n"), count(lit(1)).as("n_cells"),
      sum((col("c") * col("rx2")).cast(dec)).as("sx"),
      sum((col("c") * col("ry2")).cast(dec)).as("sy"),
      sum(col("c").cast(dec) * col("rx2") * col("rx2")).as("sxx"),
      sum(col("c").cast(dec) * col("ry2") * col("ry2")).as("syy"),
      sum(col("c").cast(dec) * col("rx2") * col("ry2")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val vx = n * d("sxx") - d("sx") * d("sx")
    val vy = n * d("syy") - d("sy") * d("sy")
    s.select(col("n"), col("n_cells"),
      when(vx > 0 && vy > 0,
        round((n * d("sxy") - d("sx") * d("sy")) / sqrt(vx * vy), 6))
        .as("rho"))
  }

  /** Double-precision fallback on Spark's `corr` — same relation shape,
    * values order-dependent in the last ulps (no oracle; spec-compared
    * to [[pearsonMatrix]] within 1e-9).
    */
  def pearsonMatrixApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = (count(lit(1)).cast("long").as("n") +:
      pairs.map { case (a, b) =>
        corr(col(a).cast("double"), col(b).cast("double"))
          .as(s"r_${a}_${b}")
      })
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val pairRows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"), col("n").as("n"),
        col(s"r_${a}_${b}").as("r"))
    }
    stats
      .select(explode(array(pairRows: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.n"), col("p.r"))
      .orderBy("col_x", "col_y")
  }

  /** KRUSKAL–WALLIS H (public method: Kruskal & Wallis 1952) — the
    * rank-based one-way ANOVA: "do these groups' value DISTRIBUTIONS
    * differ in location", robust where [[pairwiseWelch]]'s means are
    * dragged by heavy tails. Tie-averaged ranks stay integer as
    * DOUBLED ranks (the [[spearman]] convention): for a distinct
    * value with `ct` occurrences after `cum_before` smaller ones,
    * 2·rank = 2·cum_before + ct + 1 exactly.
    *
    * Shape: one (group, value) census, value-domain cumulative
    * windows over DISTINCT values only, per-group rank sums in
    * DECIMAL; H and the tie-correction factor are the only doubles,
    * rounded at 6. Output (1 row): (n, n_groups, h_stat,
    * tie_correction, h_corrected).
    */
  def kruskalWallis(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e6).cast("long")
    val cells = graft.util.Caches.cached(df
      .select(col(groupCol).as("g"), vm.as("vm"))
      .groupBy("g", "vm").agg(count(lit(1)).as("c")))
    // vm is a micro-rounded continuous domain — distinct values grow
    // with rows until the domain saturates, so the doubled ranks come
    // from the PrefixSum two-level scan, not an unpartitioned window
    val byVal = cells.groupBy("vm").agg(sum("c").as("ct"))
    val ranked = PrefixSum
      .cumBefore(byVal, "vm", "ct", "__cb", "kruskalWallis.ranks")
      .select(col("vm"),
        (lit(2L) * col("__cb") + col("ct") + 1L).as("r2"),
        col("ct"))
    val perG = cells.join(ranked.select("vm", "r2"), Seq("vm"))
      .groupBy("g")
      .agg(sum("c").as("n_h"),
        sum(col("c").cast(dec) * col("r2")).as("r2_h"))
    // the per-group rank-sum squares R2_h² reach ~4N³ — past long at
    // ~10⁶ rows and brushing DECIMAL(38) at warehouse scale — so the
    // K-row group relation collects (the house allowance) and the
    // final reduction runs in unbounded BigInt, flooring per group
    // exactly like the oracle's HUGEINT `//`
    val gs = graft.util.Guards.countedCollect(perG, "kruskalWallis")
      .map(r =>
        (BigInt(r.getLong(1)), BigInt(r.getDecimal(2).toBigInteger)))
    val tiesRow = ranked.agg(
      sum(expr(s"cast(ct as $dec) * ct * ct - ct")).as("t3"),
      sum("ct").as("n")).collect()(0)
    val t3 = BigInt(tiesRow.getDecimal(0).toBigInteger)
    val n = tiesRow.getLong(1)
    val sq = gs.map { case (nh, r2h) => (r2h * r2h) / nh }.sum
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h = r6(3.0 * sq.toDouble / (n.toDouble * (n + 1).toDouble) -
      3.0 * (n + 1).toDouble)
    // n³ assembled in the DOUBLE domain, matching the oracle's
    // n::DOUBLE*n::DOUBLE*n::DOUBLE − n::DOUBLE verbatim
    val tc = r6(1.0 - t3.toDouble /
      (n.toDouble * n.toDouble * n.toDouble - n.toDouble))
    val hc: Option[Double] = if (tc > 0) Some(r6(h / tc)) else None
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, gs.length.toLong, h, tc, hc))
      .toDF("n", "n_groups", "h_stat", "tie_correction", "h_corrected")
  }

  /** BROWN–FORSYTHE test (public method: Brown & Forsythe 1974 —
    * Levene's variance-homogeneity test with MEDIAN centers, the
    * robust form): "do these groups have the same spread", the
    * assumption check upstream of any pooled-variance contrast. The
    * statistic is the one-way ANOVA F over absolute deviations from
    * each group's median.
    *
    * Exactness: group medians are exact value-domain order statistics
    * kept in DOUBLED micro units (odd/even handled as the sum of the
    * two middle values); deviations `|2v − m2|` are exact integers;
    * all ANOVA sums run in DECIMAL and only the final F is a double,
    * rounded at 6. Output (1 row): (n, n_groups, f_stat).
    */
  def brownForsythe(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e6).cast("long")
    val cells = graft.util.Caches.cached(df
      .select(col(groupCol).as("g"), vm.as("vm"))
      .groupBy("g", "vm").agg(count(lit(1)).as("c")))
    val wg = Window.partitionBy("g").orderBy("vm")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = cells
      .withColumn("cum", sum("c").over(wg))
      .withColumn("ng", sum("c").over(Window.partitionBy("g")))
    val med = withCum
      .groupBy("g")
      .agg((min(when(col("cum") >= expr("(ng + 1) div 2"), col("vm")))
        + min(when(col("cum") >= expr("(ng + 2) div 2"), col("vm"))))
        .as("m2"))
    val dev = cells.join(broadcast(med), Seq("g"))
      .select(col("g"), col("c"),
        abs(lit(2L) * col("vm") - col("m2")).as("d"))
    val perG = dev.groupBy("g")
      .agg(sum("c").as("n_h"),
        sum(col("c").cast(dec) * col("d")).as("s_h"),
        sum(col("c").cast(dec) * col("d") * col("d")).as("ss_h"))
    // s_h² brushes DECIMAL(38) at warehouse scale — the K-row group
    // relation collects and the F assembles in BigInt (floors per
    // group ≡ the oracle's HUGEINT `//`)
    val gs = graft.util.Guards.countedCollect(perG, "brownForsythe")
      .map(r =>
        (BigInt(r.getLong(1)), BigInt(r.getDecimal(2).toBigInteger),
          BigInt(r.getDecimal(3).toBigInteger)))
    val k = gs.length
    val n = gs.map(_._1).sum
    val s = gs.map(_._2).sum
    val ss = gs.map(_._3).sum
    val sqh = gs.map { case (nh, sh, _) => (sh * sh) / nh }.sum
    val within = (ss - sqh).toDouble
    val f: Option[Double] =
      if (k > 1 && within > 0) {
        val between = sqh.toDouble - (s * s).toDouble / n.toDouble
        Some(BigDecimal((n - k).toDouble / (k - 1).toDouble *
          between / within)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      } else None
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n.toLong, k.toLong, f)).toDF("n", "n_groups", "f_stat")
  }

  /** BENJAMINI–HOCHBERG step-up FDR adjustment (public method:
    * Benjamini & Hochberg 1995) — the multiple-testing correction a
    * pairwise sweep ([[pairwiseWelch]], the PSI suite) needs before
    * anyone reads its smallest p-value: adj_p(rank t) =
    * min_{j ≥ t} p_j·n/j, capped at 1.
    *
    * Everything is ppm-integer over STAT rows: ranks come from the
    * (p asc, ids asc) total order, each candidate `p·n div j` is an
    * exact integer (DECIMAL product), and the step-up minimum is one
    * cumulative-min window from the bottom rank. Rows with NULL p
    * (degenerate tests) are excluded — documented, mirrored.
    *
    * Output per test: (idCols..., p_ppm, rank, adj_p_ppm,
    * significant), rank-ordered.
    */
  def fdrBh(df: DataFrame, idCols: Seq[String], pPpmCol: String,
      alphaPpm: Long): DataFrame = {
    require(idCols.nonEmpty && alphaPpm > 0, "ids/alpha")
    val ordered = df.filter(col(pPpmCol).isNotNull)
      .select((idCols.map(col) :+ col(pPpmCol).cast("long")
        .as("p_ppm")): _*)
    val wRank = Window.orderBy(
      (col("p_ppm").asc +: idCols.map(col(_).asc)): _*)
    val ranked = ordered
      .withColumn("rank", row_number().over(wRank))
      .withColumn("n_tests", count(lit(1)).over(Window.partitionBy()))
      .withColumn("cand", least(expr(
        "cast((cast(p_ppm as decimal(38,0)) * n_tests) div rank " +
          "as bigint)"), lit(1000000L)))
    val wUp = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked
      .withColumn("adj_p_ppm", min("cand").over(wUp))
      .select((idCols.map(col) :+ col("p_ppm") :+ col("rank") :+
        col("adj_p_ppm") :+
        (col("adj_p_ppm") <= alphaPpm).as("significant")): _*)
      .orderBy("rank")
  }

  /** DUNN's post-hoc test (public method: Dunn 1964) — WHICH groups
    * differ once [[kruskalWallis]] has said "some do": pairwise z on
    * the mean ranks over the POOLED ranking (never per-pair
    * re-ranking — that's Dunn's point), with the shared tie
    * correction. Feed the output through [[fdrBh]] for the
    * multiplicity-honest read (the q242 composition).
    *
    * Same doubled-rank census internals as [[kruskalWallis]]: every
    * sufficient statistic (per-group n_h and doubled rank sum r2_h,
    * pooled N and tie mass T = Σt³−t) is an exact integer, the K-row
    * group relation broadcast-pairs with itself, and z is the only
    * double, assembled by the formula the oracle repeats verbatim,
    * rounded at 6 (NULL when the variance term degenerates).
    *
    * Output per pair (a < b): (group_a, group_b, n_a, n_b, z_dunn).
    */
  def dunnPairs(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e6).cast("long")
    val cells = graft.util.Caches.cached(df
      .select(col(groupCol).as("g"), vm.as("vm"))
      .groupBy("g", "vm").agg(count(lit(1)).as("c")))
    // same PrefixSum doubled-rank build as kruskalWallis — vm is a
    // micro-rounded (corpus-growing) domain, never windowed unpartitioned
    val ranked = PrefixSum
      .cumBefore(cells.groupBy("vm").agg(sum("c").as("ct")),
        "vm", "ct", "__cb", "dunnPairs.ranks")
      .select(col("vm"),
        (lit(2L) * col("__cb") + col("ct") + 1L).as("r2"),
        col("ct"))
    val perG = cells.join(ranked.select("vm", "r2"), Seq("vm"))
      .groupBy("g")
      .agg(sum("c").as("n_h"),
        sum(col("c").cast(dec) * col("r2")).as("r2_h"))
    val tot = perG.agg(sum("n_h").as("n"))
    val ties = ranked.agg(
      sum(expr(s"cast(ct as $dec) * ct * ct - ct")).as("t3"))
    val a = perG.select(col("g").as("group_a"), col("n_h").as("n_a"),
      col("r2_h").as("r2_a"))
    val b = perG.select(col("g").as("group_b"), col("n_h").as("n_b"),
      col("r2_h").as("r2_b"))
    def d(c: String) = col(c).cast("double")
    // mean ranks are r2/(2n); the pooled variance term carries the
    // shared tie correction
    val varTerm = (d("n") * (d("n") + lit(1.0)) / lit(12.0) -
      d("t3") / (lit(12.0) * (d("n") - lit(1.0)))) *
      (lit(1.0) / d("n_a") + lit(1.0) / d("n_b"))
    broadcast(a).crossJoin(b)
      .filter(col("group_a") < col("group_b"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        when(col("n") > 1 && varTerm > 0, round(
          (d("r2_a") / (lit(2.0) * d("n_a")) -
            d("r2_b") / (lit(2.0) * d("n_b"))) / sqrt(varTerm), 6))
          .as("z_dunn"))
      .orderBy("group_a", "group_b")
  }

  /** JONCKHEERE–TERPSTRA ordered-alternative test (public method:
    * Jonckheere 1954; Terpstra 1952; tie-corrected variance per
    * Hollander & Wolfe) — "does the value distribution SHIFT
    * MONOTONICALLY across ordered groups": the continuous-outcome
    * sibling of [[graft.operators.Experiment.cochranArmitage]] (which
    * orders proportions) and the directional power [[kruskalWallis]]
    * throws away. Groups order by their numeric key.
    *
    * JT doubles to stay integer: JT2 = Σ_{i<j} Σ_v c_j(v)·(2·cum_i(<v)
    * + c_i(v)) over the DENSE per-group cumulative census (distinct
    * values × K groups — value-domain grain, K²·|values| join rows,
    * never data²); the null mean E2 = N² − Σn², and the three
    * tie-corrected variance pieces A, B₁·B₂, C₁·C₂ are exact DECIMAL
    * integers from the group-size and tie censuses:
    *
    *   Var = A/72 + B₁B₂/(36·N(N−1)(N−2)) + C₁C₂/(8·N(N−1))
    *
    * z = (JT2 − E2)/(2√Var) is the only double, rounded at 6, NULL
    * when Var degenerates. Output (1 row): (n, n_groups, jt2, e2,
    * z_jt).
    */
  def jonckheereTerpstra(df: DataFrame, groupOrdCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e6).cast("long")
    val cells = graft.util.Caches.cached(df
      .select(col(groupOrdCol).cast("long").as("g"), vm.as("vm"))
      .groupBy("g", "vm").agg(count(lit(1)).as("c")))
    val vs = cells.select("vm").distinct()
    val gs = cells.select("g").distinct()
    val dense = vs.crossJoin(broadcast(gs))
      .join(cells, Seq("g", "vm"), "left").na.fill(0L, Seq("c"))
    val wCum = Window.partitionBy("g").orderBy("vm")
      .rowsBetween(Window.unboundedPreceding, 0)
    val dc = dense
      .withColumn("cumlt", sum("c").over(wCum) - col("c"))
    val a = dc.select(col("g").as("ga"), col("vm"),
      col("c").as("ca"), col("cumlt").as("cumlt_a"))
    val b = dc.select(col("g").as("gb"), col("vm"),
      col("c").as("cb"))
    val jt = a.join(b, Seq("vm")).filter(col("ga") < col("gb"))
      .agg(sum(expr(
        s"cast(cb as $dec) * (2 * cumlt_a + ca)")).as("jt2"))
    val ng = cells.groupBy("g").agg(sum("c").as("n_k"))
      .agg(count(lit(1)).as("n_groups"), sum("n_k").as("n"),
        sum(expr(s"cast(n_k as $dec) * n_k")).as("sq_n"),
        sum(expr(s"cast(n_k as $dec) * (n_k - 1) * (2 * n_k + 5)"))
          .as("a_g"),
        sum(expr(s"cast(n_k as $dec) * (n_k - 1) * (n_k - 2)"))
          .as("b1"),
        sum(expr(s"cast(n_k as $dec) * (n_k - 1)")).as("c1"))
    val tiesAgg = cells.groupBy("vm").agg(sum("c").as("t"))
      .agg(
        sum(expr(s"cast(t as $dec) * (t - 1) * (2 * t + 5)"))
          .as("a_t"),
        sum(expr(s"cast(t as $dec) * (t - 1) * (t - 2)")).as("b2"),
        sum(expr(s"cast(t as $dec) * (t - 1)")).as("c2"))
    def d(c: String) = col(c).cast("double")
    val varJt =
      (d("n") * (d("n") - 1.0) * (lit(2.0) * d("n") + 5.0) -
        d("a_g") - d("a_t")) / lit(72.0) +
        d("b1") * d("b2") / (lit(36.0) * d("n") * (d("n") - 1.0) *
          (d("n") - 2.0)) +
        d("c1") * d("c2") / (lit(8.0) * d("n") * (d("n") - 1.0))
    jt.crossJoin(ng).crossJoin(tiesAgg)
      // E[JT2] = Σ_{i<j} n_i·n_j = (N² − Σn²)/2, always an integer
      .withColumn("e2", expr(
        s"(cast(n as $dec) * n - sq_n) div 2"))
      .select(col("n"), col("n_groups"),
        col("jt2").cast("long").as("jt2"),
        col("e2").cast("long").as("e2"),
        when(col("n") > 2 && varJt > 0, round(
          (d("jt2") - d("e2")) / (lit(2.0) * sqrt(varJt)), 6))
          .as("z_jt"))
  }
}
