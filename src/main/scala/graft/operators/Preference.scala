package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise-preference analytics — the RLHF/evaluation data shapes:
  * a matchup census ("who beats whom, how often"), Bradley–Terry
  * strength fitting over it, and Wilson-bounded win rates.
  *
  * Public methods: Bradley & Terry 1952 (paired-comparison model),
  * Hunter 2004 (the MM algorithm the fit unrolls), Wilson 1927 (the
  * score interval). The reference engine has no preference surface;
  * this is part of the training-data extension (preference data is
  * how post-training corpora are graded before they are trusted).
  *
  * Scale shape: the matchup census is (unit×item aggregate) →
  * (within-unit pair join) → K²-row census, linear in units (never
  * units²); the Bradley–Terry fit runs driver-side over the collected
  * ≤K² census (the house K-row-stat allowance, the q230 pattern) in
  * exact BigInt micro arithmetic so the oracle's unrolled HUGEINT
  * rounds reproduce it bit-for-bit.
  */
object Preference {

  /** Micro-integer scale shared with the oracle. */
  val Micro = 1000000L

  /** The MM update's intermediate scale: n_ij·SCALE div (w_i+w_j)
    * keeps ~6 significant digits past the strength grid.
    */
  val MmScale: BigInt = BigInt(10).pow(12)

  /** MATCHUP CENSUS: within each unit (a user, an annotation session),
    * every pair of items both observed there is one "game"; the item
    * whose micro-value total is larger wins, exact ties are counted
    * but are not decisions. Output per unordered pair (item_a <
    * item_b): (item_a, item_b, wins_a, wins_b, ties, n_decisions).
    *
    * Values quantize to micro at the scan and the per-unit totals are
    * exact BIGINT sums, so the winner predicate is cross-engine exact.
    * The pair join is unit-keyed: cells = units×K rows, pairs =
    * units×K²/2 — linear in units, and the census output is ≤K² rows.
    */
  def matchupCensus(df: DataFrame, unitCol: String, itemCol: String,
      valCol: String): DataFrame = {
    val vm = round(col(valCol).cast("double") * Micro).cast("long")
    val totals = df
      .select(col(unitCol).as("u"), col(itemCol).as("it"), vm.as("v"))
      .groupBy("u", "it").agg(sum("v").as("sv"))
    val a = totals.select(col("u"), col("it").as("item_a"),
      col("sv").as("sa"))
    val b = totals.select(col("u"), col("it").as("item_b"),
      col("sv").as("sb"))
    a.join(b, Seq("u")).filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(sum(when(col("sa") > col("sb"), 1L).otherwise(0L))
        .as("wins_a"),
        sum(when(col("sa") < col("sb"), 1L).otherwise(0L))
          .as("wins_b"),
        sum(when(col("sa") === col("sb"), 1L).otherwise(0L))
          .as("ties"))
      .withColumn("n_decisions", col("wins_a") + col("wins_b"))
      .orderBy("item_a", "item_b")
  }

  /** BRADLEY–TERRY strength fit by `rounds` MM iterations over a
    * matchup census (columns item_a/item_b/wins_a/wins_b). Strengths
    * live on the micro grid; each MM round is, per item,
    *
    *   d_i  = Σ_j  (n_ij · SCALE) div (w_i + w_j)
    *   w'_i = (W_i · SCALE)       div d_i
    *
    * followed by a sum-normalization back to K·10⁶ total mass —
    * every operation a positive-integer truncating division, so the
    * oracle's HUGEINT `//` unroll is bit-identical. Items with zero
    * decisions are excluded (their likelihood is flat). The census is
    * ≤K² rows, so the fit is driver-side under the house K-row-stat
    * allowance; no data row ever leaves the cluster.
    *
    * Output per item: (item, wins, games, strength_micro, rank) with
    * rank by (strength desc, item asc).
    */
  def bradleyTerry(matchups: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "rounds in [1,8]")
    val rows = graft.util.Guards.countedCollect(matchups
        .select(col("item_a").cast("string"),
          col("item_b").cast("string"),
          col("wins_a").cast("long"), col("wins_b").cast("long")),
        "bradleyTerry")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // directed view: (i, j, n_ij, wins of i over j)
    val games = rows.flatMap { case (a, b, wa, wb) =>
      val n = wa + wb
      if (n == 0L) Nil
      else Seq((a, b, n, wa), (b, a, n, wb))
    }
    val items = games.map(_._1).distinct.sorted
    // indexed once: the MM loop reads each item's games every round,
    // and a full-array filter there would make the fit O(rounds·K·|games|)
    val bySrc = games.groupBy(_._1)
    val wins = bySrc.map { case (i, g) =>
      i -> BigInt(g.map(_._4).sum)
    }
    var w: Map[String, BigInt] =
      items.map(_ -> BigInt(Micro)).toMap
    val totalMass = BigInt(items.length) * Micro
    for (_ <- 1 to rounds) {
      val raw = items.map { i =>
        val d = bySrc(i).map { case (_, j, n, _) =>
          (BigInt(n) * MmScale) / (w(i) + w(j))
        }.sum
        i -> (if (d > 0) (wins(i) * MmScale) / d else BigInt(0))
      }
      val tot = raw.map(_._2).sum
      w = raw.map { case (i, r) =>
        i -> (if (tot > 0) (r * totalMass) / tot else BigInt(0))
      }.toMap
    }
    val out = items.map { i =>
      val g = bySrc(i).map(_._3).sum
      (i, wins(i).toLong, g, w(i).toLong)
    }.sortBy { case (i, _, _, s) => (-s, i) }
      .zipWithIndex
      .map { case ((i, win, g, s), idx) =>
        (i, win, g, s, (idx + 1).toLong)
      }
    val spark = matchups.sparkSession
    import spark.implicits._
    out.toSeq
      .toDF("item", "wins", "games", "strength_micro", "rank")
  }

  /** WILSON-bounded win-rate matrix over a matchup census: for each
    * ordered pair with at least one decision, the plug-in win rate in
    * exact ppm plus the Wilson score interval at the frozen z — the
    * interval that stays inside [0,1] and stays honest at n=1 where
    * the Wald interval collapses. Bounds are the only doubles,
    * assembled from the exact integers by the formula the oracle
    * repeats verbatim, rounded at 6.
    *
    * Output per ordered pair: (item, opponent, wins, n_decisions,
    * win_rate_ppm, wilson_lo, wilson_hi).
    */
  def winRateMatrix(matchups: DataFrame,
      z: Double = 1.96): DataFrame = {
    val base = matchups.select(col("item_a"), col("item_b"),
      col("wins_a").cast("long"), col("wins_b").cast("long"))
    // explode, not union: one upstream execution for both orientations
    // (round-14, the Graph.bothDirections rationale)
    val both = base.select(explode(array(
      struct(col("item_a").as("item"), col("item_b").as("opponent"),
        col("wins_a").as("wins"), (col("wins_a") + col("wins_b")).as("n")),
      struct(col("item_b").as("item"), col("item_a").as("opponent"),
        col("wins_b").as("wins"), (col("wins_a") + col("wins_b")).as("n"))))
      .as("e")).select(col("e.*"))
    val zz = z * z
    val p = col("wins").cast("double") / col("n").cast("double")
    val nD = col("n").cast("double")
    val denom = lit(1.0) + lit(zz) / nD
    val center = (p + lit(zz) / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(zz) / (lit(4.0) * nD * nD))) / denom
    both.filter(col("n") > 0)
      .select(col("item"), col("opponent"), col("wins"),
        col("n").as("n_decisions"),
        expr(s"(wins * ${Micro}L) div n").as("win_rate_ppm"),
        round(center - half, 6).as("wilson_lo"),
        round(center + half, 6).as("wilson_hi"))
      .orderBy("item", "opponent")
  }

  /** McNEMAR's paired test (public method: McNemar 1947) on paired
    * binary outcomes — "did the condition's rate CHANGE on the same
    * units", the within-subject sibling of the two-proportion z
    * (q193): only the discordant units carry information. Input is
    * one row per unit with boolean columns a and b; the statistic is
    * the continuity-corrected (|b01 − b10| − 1)² / (b01 + b10).
    *
    * One aggregate row; the four concordance cells are exact counts
    * and the statistic is the only double, rounded at 6 (NULL when
    * there are no discordant units — the test is undefined).
    *
    * Output (1 row): (n, a_only, b_only, n_both, n_neither, chi2_cc).
    */
  def mcnemar(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val a = col(aCol)
    val b = col(bCol)
    pairs.agg(
      count(lit(1)).as("n"),
      sum(when(a && !b, 1L).otherwise(0L)).as("a_only"),
      sum(when(!a && b, 1L).otherwise(0L)).as("b_only"),
      sum(when(a && b, 1L).otherwise(0L)).as("n_both"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("n_neither"))
      .withColumn("chi2_cc",
        when(col("a_only") + col("b_only") > 0,
          round(
            (abs(col("a_only") - col("b_only")).cast("double") -
              lit(1.0)) *
              (abs(col("a_only") - col("b_only")).cast("double") -
                lit(1.0)) /
              (col("a_only") + col("b_only")).cast("double"), 6)))
  }

  /** FLEISS' κ (public method: Fleiss 1971) — chance-corrected
    * agreement for n raters per item, the multi-rater generalization
    * of Cohen's κ (q225): the annotation-quality number for any
    * labeling pipeline with more than two raters. Items without
    * exactly `nRaters` ratings are excluded (Fleiss requires a
    * balanced panel) and the exclusion is reported.
    *
    * All sufficient statistics are exact integers — the agreement
    * numerator Σ_i Σ_c n_ic² − n, and the category masses S_c — and
    * P̄, P̄e, κ are the only doubles, assembled by the formula the
    * oracle repeats verbatim, rounded at 6. Stat grain after the
    * item×category census; one aggregate row out.
    *
    * Output (1 row): (n_items, n_raters, n_categories, p_observed,
    * p_expected, kappa).
    */
  def fleissKappa(ratings: DataFrame, itemCol: String, catCol: String,
      nRaters: Int): DataFrame = {
    require(nRaters >= 2, "nRaters >= 2")
    val cen = ratings
      .select(col(itemCol).as("item"), col(catCol).as("cat"))
      .groupBy("item", "cat").agg(count(lit(1)).as("c"))
    val keep = cen
      .withColumn("tot", sum("c").over(Window.partitionBy("item")))
      .filter(col("tot") === nRaters)
    // per-category masses over the kept panel; Σ S_c² stays integer in
    // DECIMAL (S_c ≤ N·n, squares pass long at ~10⁹ ratings)
    val byCat = keep.groupBy("cat")
      .agg(sum("c").as("s_c"))
      .agg(count(lit(1)).as("n_categories"),
        sum(expr("cast(s_c as decimal(38,0)) * s_c")).as("pe_num"))
    val byItem = keep.groupBy("item")
      .agg(sum(expr("cast(c as decimal(38,0)) * c")).as("sq"))
      .agg(count(lit(1)).as("n_items"),
        sum("sq").as("sq_sum"))
    val n = lit(nRaters.toLong)
    byItem.crossJoin(byCat)
      .select(col("n_items"), n.as("n_raters"), col("n_categories"),
        col("sq_sum"), col("pe_num"))
      .withColumn("p_observed", round(
        (col("sq_sum").cast("double") -
          col("n_items").cast("double") * n.cast("double")) /
          (col("n_items").cast("double") * n.cast("double") *
            (n.cast("double") - lit(1.0))), 6))
      .withColumn("p_expected", round(
        col("pe_num").cast("double") /
          (col("n_items").cast("double") * n.cast("double") *
            col("n_items").cast("double") * n.cast("double")), 6))
      .withColumn("kappa",
        when(col("p_expected") < 1.0, round(
          (col("p_observed") - col("p_expected")) /
            (lit(1.0) - col("p_expected")), 6)))
      .select("n_items", "n_raters", "n_categories", "p_observed",
        "p_expected", "kappa")
  }

  /** KRIPPENDORFF's α, nominal data (public method: Krippendorff
    * 1970/2004) — the agreement coefficient that TOLERATES missing
    * ratings: items keep contributing with however many (≥2) ratings
    * they have, where [[fleissKappa]] must throw unbalanced panels
    * away. The real annotation-QA default once raters drop out.
    *
    * Exactness: the only fractional step — each item's off-diagonal
    * coincidence mass (m_i² − Σ_c n_ic²)/(m_i − 1) — is cleared by
    * the constant S = lcm(1..maxRaters−1), so `S | (m_i−1)`-scaled
    * terms are exact integers; the coincidence MARGINALS collapse to
    * the plain category counts (Σ_k o_ck = n_ic telescopes), so
    *
    *   α = 1 − (n−1)·o_off_S / (S·(n² − Σ_c n_c²))
    *
    * assembles from integer sufficient statistics (DECIMAL sums) with
    * α the only double, rounded at 6 and NULL when the expected
    * disagreement is 0 (a single category). Shape: one item×category
    * census, stat-grain algebra, one row out.
    *
    * Output (1 row): (n_items, n_ratings, n_categories, alpha).
    */
  /** CRONBACH's α (public method: Cronbach 1951) — internal
    * consistency of a multi-item score: do the k items of a scale
    * (here: a unit's scores on k fixed items) move together enough to
    * be averaged into one number. The reliability sibling of the
    * agreement family ([[fleissKappa]]/[[krippendorffAlpha]] ask "do
    * raters agree"; this asks "do items cohere").
    *
    *   α = k/(k−1) · (1 − Σᵢ σ²ᵢ / σ²_total)
    *
    * over COMPLETE units only (units scored on all k items — the
    * classic listwise rule, reported). Variances are ddof-1 in the
    * exact integer domain: every σ² is (n·Σx² − (Σx)²) over micro
    * scores in DECIMAL, and the shared n·(n−1) denominators cancel,
    * so α = k/(k−1) · (1 − Σᵢ vᵢ / v_tot) with vᵢ, v_tot exact
    * integers; α is the only double, rounded at 6 (NULL when the
    * total variance is 0). Shape: one unit×item aggregate, one
    * unit-total relation, two stat rows joined.
    *
    * Output (1 row): (n_units, n_items, alpha).
    */
  def cronbachAlpha(df: DataFrame, unitCol: String, itemCol: String,
      valCol: String, items: Seq[String]): DataFrame = {
    require(items.nonEmpty && items.size >= 2, "need >= 2 items")
    val dec = "decimal(38,0)"
    val k = items.size
    val vm = round(col(valCol).cast("double") * Micro).cast("long")
    val cells = df
      .filter(col(itemCol).isin(items: _*))
      .select(col(unitCol).as("u"), col(itemCol).as("it"), vm.as("v"))
      .groupBy("u", "it").agg(sum("v").as("s"))
    // complete cases: units holding all k items
    val complete = graft.util.Caches.cached(cells
      .withColumn("n_it", count(lit(1))
        .over(Window.partitionBy("u")))
      .filter(col("n_it") === k)
      .drop("n_it"))
    // per-item variance cores v_i = n·Σs² − (Σs)², summed over items
    val perItem = complete.groupBy("it")
      .agg(count(lit(1)).as("n"),
        sum(col("s").cast(dec)).as("sx"),
        sum(expr(s"cast(s as $dec) * s")).as("sxx"))
      .agg(sum(lit(1L)).as("n_items"), max("n").as("n_units"),
        sum(expr(s"cast(n as $dec) * sxx - sx * sx")).as("v_items"))
    // total-score variance core on the same units
    val totals = complete.groupBy("u")
      .agg(sum("s").as("t"))
      .agg(count(lit(1)).as("n_t"),
        sum(col("t").cast(dec)).as("st"),
        sum(expr(s"cast(t as $dec) * t")).as("stt"))
      .select(expr(s"cast(n_t as $dec) * stt - st * st").as("v_tot"))
    perItem.crossJoin(totals)
      .select(col("n_units"), col("n_items"),
        when(col("v_tot") > 0, round(
          lit(k.toDouble / (k - 1.0)) *
            (lit(1.0) - col("v_items").cast("double") /
              col("v_tot").cast("double")), 6)).as("alpha"))
  }

  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
      catCol: String, maxRaters: Int): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 16, "maxRaters in [2,16]")
    val scale = (1 until maxRaters)
      .foldLeft(BigInt(1))((l, i) => l * i / l.gcd(BigInt(i))).toLong
    val dec = "decimal(38,0)"
    // the census feeds three branches (per-item stats, the panel
    // filter, the category marginals) — cache it so the scan runs once
    val cen = graft.util.Caches.cached(ratings
      .select(col(itemCol).as("item"), col(catCol).as("cat"))
      .groupBy("item", "cat").agg(count(lit(1)).as("c")))
    val perItem = cen.groupBy("item")
      .agg(sum("c").as("m"),
        sum(expr(s"cast(c as $dec) * c")).as("sq"))
      .filter(col("m") >= 2)
    // the lcm-clearing exactness contract needs (m-1) | scale for
    // every item — an item rated by MORE than the declared panel cap
    // would silently floor the div, so fail loudly instead (1-row agg
    // on the already-cached census, not a per-row pass)
    val mMax = perItem.agg(max(col("m"))).collect()(0)
    require(mMax.isNullAt(0) || mMax.getLong(0) <= maxRaters,
      s"krippendorffAlpha: an item has ${mMax.getLong(0)} ratings, " +
        s"over the declared maxRaters=$maxRaters — the lcm scale " +
        "no longer clears (m-1); raise maxRaters")
    require(scale > 0, "scale")
    val items = perItem.agg(
      count(lit(1)).as("n_items"), sum("m").as("n_ratings"),
      sum(expr(s"(cast(m as $dec) * m - sq) * ${scale}L " +
        "div (m - 1)")).as("o_off_s"))
    // category marginals over the SAME ≥2-rating panel
    val cats = cen
      .join(perItem.select("item"), Seq("item"))
      .groupBy("cat").agg(sum("c").as("n_c"))
      .agg(count(lit(1)).as("n_categories"),
        sum(expr(s"cast(n_c as $dec) * n_c")).as("sq_c"))
    items.crossJoin(cats)
      .withColumn("d_e_s", expr(
        s"(cast(n_ratings as $dec) * n_ratings - sq_c) * ${scale}L"))
      .select(col("n_items"), col("n_ratings"), col("n_categories"),
        when(col("d_e_s") > 0, round(lit(1.0) -
          ((col("n_ratings") - 1).cast("double") *
            col("o_off_s").cast("double")) /
            col("d_e_s").cast("double"), 6)).as("alpha"))
  }
}
