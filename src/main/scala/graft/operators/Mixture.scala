package graft.operators

import org.apache.spark.sql.DataFrame
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
}
