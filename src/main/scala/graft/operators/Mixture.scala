package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture rebalancing: downsample strata so the OUTPUT matches a
  * target share distribution — the "20% code, 30% web, …" dataset-mixing
  * step, where [[Sampling.stratifiedSample]] applies caller-chosen rates,
  * this derives the rates from the data.
  *
  * Rate math: the largest total satisfying every target share without
  * upsampling is T = min_g(n_g / share_g); stratum g then keeps
  * rate_g = share_g · T / n_g of its rows (the binding stratum keeps
  * everything). Groups not in `shares` are dropped.
  *
  * Scale shape: one count aggregate (stat rows, one per stratum), a
  * scalar min over it, and the same scan-stage hash filter as
  * [[Sampling.hashSample]] — data rows never shuffle; the rate relation
  * is broadcast. Rates are computed inside the plan (no driver loop), so
  * the whole rebalance is ONE declarative query and the DuckDB oracle
  * reproduces it exactly (same IEEE double expression on both engines).
  */
object Mixture {

  /** @param shares target share per stratum value, summing to ~1; listed
    *               shares must be > 0. Rows of unlisted strata are
    *               dropped.
    */
  def rebalance(df: DataFrame, groupCol: String, shares: Map[String, Double],
      idCol: String = "doc_id"): DataFrame = {
    require(shares.nonEmpty, "need at least one target share")
    require(shares.values.forall(_ > 0.0), "listed shares must be > 0")
    require(math.abs(shares.values.sum - 1.0) < 1e-9, "shares must sum to 1")
    val spark = df.sparkSession
    import spark.implicits._
    val sharesDf = shares.toSeq.sortBy(_._1).toDF(groupCol, "__share")
    // G stat rows, checkpointed: the t scalar and the rate relation
    // would otherwise each re-run the counting scan
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .localCheckpoint()
    val joined = counts.join(sharesDf, Seq(groupCol))
    val t = joined.agg(min(col("__n") / col("__share")).as("__t"))
    val rates = joined.crossJoin(broadcast(t))
      .select(col(groupCol),
        (col("__share") * col("__t") / col("__n")).as("__rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(Sampling.idHash(col(idCol)).cast("double")
        < col("__rate") * Sampling.HashMod)
      .drop("__rate")
  }

  /** Temperature-flattened mixture (α-sampling, the XLM-R/mT5
    * multilingual move): target shares are derived FROM the observed
    * distribution — share_g ∝ n_g^α — so high-resource strata flatten
    * toward the tail as α → 0; α = 1 reproduces the input (rates land
    * within ulps of 1.0 — far inside the 1/HashMod resolution of the
    * hash filter, so every row keeps). Downsampling then proceeds
    * exactly as [[rebalance]].
    *
    * Numerics: each stratum weight n^α is rounded to integer
    * micro-points BEFORE the normalizing sum, so the Σ over strata is
    * order-independent and the share doubles are bit-identical
    * cross-engine. α = 0.5 computes via `sqrt` — IEEE-correctly-rounded
    * on both engines, unlike general `pow` — making it the
    * oracle-exact setting.
    *
    * Scale shape identical to [[rebalance]]: stat-row aggregates +
    * broadcast rate relation + scan-stage hash filter; data rows never
    * shuffle.
    */
  def temperatureRebalance(df: DataFrame, groupCol: String,
      alpha: Double = 0.5, idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    // G stat rows, checkpointed (see rebalance)
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .localCheckpoint()
    val wcol = if (alpha == 0.5) sqrt(col("__n")) else pow(col("__n"), lit(alpha))
    val w = counts.withColumn("__wq", round(wcol * lit(1000000.0)).cast("long"))
    val sw = w.agg(sum("__wq").as("__sw"))
    val sh = w.crossJoin(broadcast(sw))
      .withColumn("__share", col("__wq") / col("__sw"))
    val t = sh.agg(min(col("__n") / col("__share")).as("__t"))
    val rates = sh.crossJoin(broadcast(t))
      .select(col(groupCol), ((col("__share") * col("__t")) / col("__n")).as("__rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(Sampling.idHash(col(idCol)).cast("double")
        < col("__rate") * Sampling.HashMod)
      .drop("__rate")
  }

  /** RAKING — iterative proportional fitting (public method: Deming &
    * Stephan 1940) of a two-way cell table to target margins: the
    * corpus-reweighting move when you want the LANGUAGE mix equalized
    * without disturbing the observed SOURCE mix (or any other pair of
    * marginals). [[rebalance]] reweights one axis; raking satisfies
    * two at once — each round scales rows to the row targets then
    * columns to the column targets, and the round count is the knob.
    *
    * Everything lives on the micro-mass grid: cell weights start at
    * n_rc·10⁶, row targets are an equal split of the total micro mass
    * (no integrality juggling — mass, not counts), column targets are
    * the observed column masses, and every scaling step is one
    * truncating `(w·T) div margin` the oracle repeats in HUGEINT `//`
    * for `rounds` unrolled rounds. The cell table is GROUP-grain
    * (|rows|×|cols|), so each round is stat-grain window algebra; no
    * data row is touched after the census.
    *
    * The companion diagnostic: per-doc weight = cell weight / n_rc,
    * so ESS = (Σ w_c)² / Σ (w_c²/n_c) with the per-cell fraction
    * micro-floored (the q252 quantization contract).
    *
    * Output per cell: (rowKey, colKey, n, weight_micro, w_row_ppm —
    * the achieved row share) plus the 1-row [[rakeDiagnostics]].
    */
  def rakeWeights(df: DataFrame, rowCol: String, colCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 4, "rounds in [1,4]")
    // the cell census feeds both the row-key count and the fit — cache
    val cen = graft.util.Caches.cached(
      df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
        .agg(count(lit(1)).as("n")))
    val wRow = Window.partitionBy("r")
    val wCol = Window.partitionBy("c")
    val wAll = Window.partitionBy()
    // row target: equal split of total micro mass across DISTINCT row
    // keys; column target: the observed column mass (unchanged margin)
    val nRows = cen.select("r").distinct()
      .agg(count(lit(1)).as("n_row_keys"))
    var cur = cen
      .withColumn("w", col("n").cast("decimal(38,0)") * 1000000L)
      .crossJoin(broadcast(nRows))
      .withColumn("total_mass",
        sum(col("n").cast("decimal(38,0)") * 1000000L).over(wAll))
      .withColumn("t_row",
        expr("total_mass div n_row_keys"))
      .withColumn("t_col",
        sum(col("n").cast("decimal(38,0)") * 1000000L).over(wCol))
    for (_ <- 1 to rounds) {
      cur = cur
        .withColumn("m_row", sum("w").over(wRow))
        .withColumn("w", expr("(w * t_row) div m_row"))
        .withColumn("m_col", sum("w").over(wCol))
        .withColumn("w", expr("(w * t_col) div m_col"))
        .drop("m_row", "m_col")
    }
    cur
      .withColumn("w_row_mass", sum("w").over(wRow))
      .withColumn("w_total", sum("w").over(wAll))
      .select(col("r").as(rowCol), col("c").as(colCol), col("n"),
        col("w").cast("long").as("weight_micro"),
        expr("cast((w_row_mass * 1000000) div w_total as long)")
          .as("w_row_ppm"))
      .orderBy(rowCol, colCol)
  }

  /** ESS diagnostic over a raked (or any) cell-weight table: treats
    * each cell's weight as shared equally by its n members, so
    * ESS = (Σw)² / Σ(w²/n) with the per-cell fraction micro-floored
    * on both engines. Output (1 row): (n, n_cells, sum_w_micro,
    * ess, ess_ratio_ppm).
    */
  def weightEss(cells: DataFrame, nCol: String,
      weightMicroCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    cells.agg(
      sum(nCol).as("n"), count(lit(1)).as("n_cells"),
      sum(col(weightMicroCol).cast(dec)).as("sum_w_micro"),
      sum(expr(s"(cast($weightMicroCol as $dec) * " +
        s"$weightMicroCol) div $nCol")).as("sq_per"))
      .select(col("n"), col("n_cells"),
        col("sum_w_micro").cast("long").as("sum_w_micro"),
        when(col("sq_per") > 0, round(
          col("sum_w_micro").cast("double") *
            col("sum_w_micro").cast("double") /
            col("sq_per").cast("double"), 6)).as("ess"),
        when(col("sq_per") > 0 && col("n") > 0, expr(
          "cast((cast(sum_w_micro as decimal(38,0)) * sum_w_micro " +
            "div sq_per) * 1000000 div n as long)"))
          .as("ess_ratio_ppm"))
  }
}
