package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (public
  * method: Fellegi & Sunter 1969; the Splink/JedAI lineage): given
  * BLOCKED candidate pairs with per-field agreement flags, learn each
  * field's m-probability (P(agree | same entity)) and u-probability
  * (P(agree | different entities)) by EM over a two-class latent
  * mixture, plus the match prior λ. The learned log-weights are what
  * a dedup/linkage pass thresholds on; fields whose m ≈ u carry no
  * signal and fall out naturally.
  *
  * Scale + determinism design:
  *  - the EM state is K SCALARS (λ and per-field m, u) — each round is
  *    ONE aggregate over the pair relation; rounds chain through
  *    broadcast joins of the 1-row parameter relation, so a fixed
  *    round count is a single DAG with no driver collects;
  *  - the whole recursion runs in the MICRO-INTEGER domain: the
  *    per-pair posterior quantizes to micro before any sum, so every
  *    round's sums are exact integers (DECIMAL(38,0) ≡ HUGEINT) and
  *    the learned parameters are reproducible verbatim in SQL — the
  *    float-sum-order hazard never exists;
  *  - pair generation is the CALLER's blocking choice; this operator
  *    never fans out.
  */
object Linkage {

  /** Initial parameters, micro (frozen on both engines). */
  val M0 = 900000L
  val U0 = 100000L
  val Lambda0 = 500000L

  /** Exact within-block candidate pairs: every unordered record pair
    * sharing `blockCol`, canonicalised by `idCol` (a < b). Output: the
    * input columns twice, prefixed `a_` / `b_`.
    *
    * SCALING TIER (round-14, the q233 treatment): this call is the
    * ORACLE tier — block sizes are unbounded, so the pair count grows
    * as Σ n_block² and no downstream rewrite can change it (the
    * quadratic is the output relation itself; q210's α > 1 in the
    * scaling artifact is this contract, not a plan defect). PRODUCTION
    * is [[sortedNeighborhoodPairs]] (q210a): candidates restricted to
    * same-or-adjacent sort-key buckets, Σ n_bucket·(n_bucket+n_next)
    * pairs — linear in block size for any fixed value density — the
    * documented recall trade (pairs farther than `bucketWidth` on the
    * sort key are not candidates) a corpus-scale linkage run ships.
    */
  def blockedPairs(df: DataFrame, blockCol: String, idCol: String): DataFrame = {
    val out = df.columns.map(f => col(s"a.$f").as(s"a_$f")) ++
      df.columns.map(f => col(s"b.$f").as(s"b_$f"))
    df.as("a").join(df.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(out.toSeq: _*)
  }

  /** Sorted-neighborhood candidate pairs — the 100 TB blocking tier
    * (public method: Hernández & Stolfo 1995's sorted-neighborhood,
    * here in its bucketed form): records pair only when they share
    * `blockCol` AND their `sortCol` values land in the same or
    * ADJACENT bucket of width `bucketWidth`, so two records closer
    * than `bucketWidth` on the sort key are always candidates while a
    * block's pair count drops from n² to Σ n_bucket·(n_bucket +
    * n_next) — linear in n for any fixed value density.
    *
    * `sortCol` must be integral (callers quantize, e.g. cents);
    * buckets use TRUNCATING division — Spark `div` ≡ DuckDB `//`
    * verbatim (both round toward zero, measured, so no sign-split is
    * needed). On negative sort keys the zero bucket is double-width;
    * bucketing stays monotone with every interval ≥ `bucketWidth`
    * wide, which is all the same/adjacent adjacency guarantee needs.
    * Pair canonical form: same bucket → a.id < b.id; adjacent buckets
    * → a is the lower bucket (each unordered pair appears exactly
    * once). Spark shape: the probe side fans out to (bk, bk+1) via a
    * 2-element explode, then one equi shuffle join on (block, bucket)
    * — no non-equi condition reaches the join, so AQE/skew handling
    * apply as usual. Law (spec-pinned): SN pairs ⊆ [[blockedPairs]]
    * of the same block column.
    */
  def sortedNeighborhoodPairs(df: DataFrame, blockCol: String,
      sortCol: String, bucketWidth: Long, idCol: String): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = df.withColumn("__bk", expr(s"$sortCol div $bucketWidth"))
    val probe = b.withColumn("__jk",
      explode(array(col("__bk"), col("__bk") + 1)))
    val out = df.columns.map(f => col(s"a.$f").as(s"a_$f")) ++
      df.columns.map(f => col(s"b.$f").as(s"b_$f"))
    probe.as("a").join(b.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
        col("a.__jk") === col("b.__bk"))
      .filter((col("a.__bk") === col("b.__bk") &&
          col(s"a.$idCol") < col(s"b.$idCol")) ||
        col("a.__bk") + 1 === col("b.__bk"))
      .select(out.toSeq: _*)
  }

  /** Per-pair match posterior in micro given micro params: γ =
    * λ·Πf(agree ? m : 1e6−m) / (that + (1−λ)·Πf(agree ? u : 1e6−u)).
    * Products stay in DOUBLE (per-row closed form from integer params
    * — deterministic), the result re-quantizes to micro.
    */
  private def gammaMicro(agree: Seq[Column], lm: Column,
      ms: Seq[Column], us: Seq[Column]): Column = {
    val a = agree.zip(ms).map { case (g, m) =>
      when(g, m.cast("double")).otherwise(lit(1e6) - m) }
      .foldLeft(lm.cast("double"))(_ * _)
    val b = agree.zip(us).map { case (g, u) =>
      when(g, u.cast("double")).otherwise(lit(1e6) - u) }
      .foldLeft(lit(1e6) - lm)(_ * _)
    round(a / (a + b) * lit(1e6)).cast("long")
  }

  /** EM-learned linkage parameters after `rounds` iterations.
    *
    * `pairs` carries one row per candidate pair with BOOLEAN agreement
    * columns `agreementCols`. Output (ONE row): n_pairs, lambda_micro,
    * then per field f: f_m_micro, f_u_micro, and finally n_matched —
    * pairs whose final posterior exceeds ½ (γ_micro > 500000).
    */
  def emWeights(pairs: DataFrame, agreementCols: Seq[String],
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && agreementCols.nonEmpty, "rounds/fields")
    val dec = "decimal(38,0)"
    // AGREEMENT-PATTERN CENSUS (round-14): every EM statistic depends
    // on a pair ONLY through its boolean agreement vector, so the pair
    // relation collapses to ≤ 2^F (< 3^F with nulls) stat rows of
    // (pattern, weight) BEFORE any EM round runs. The previous shape
    // cached the full pair relation and re-aggregated it once per
    // round plus once for the final posterior — `rounds`+1 passes over
    // Σ-pairs rows; this shape scans the pairs ONCE (partial
    // aggregation collapses each map task to the pattern census, so
    // the shuffle is bytes) and every EM round is arithmetic over stat
    // rows. Values are verbatim-identical: all sums are integers in
    // DECIMAL(38,0), and Σ_{pairs with pattern p} γ(p) = w_p · γ(p)
    // exactly — the oracle keeps its per-pair unrolled form.
    val census = graft.util.Caches.cached(
      pairs.groupBy(agreementCols.map(col): _*)
        .agg(count(lit(1)).cast(dec).as("__w")))
    val agree = agreementCols.map(col)
    val w = col("__w")
    // parameter relation: 1 row (lm, m_<f>, u_<f> micro)
    var params = census.sparkSession.range(1).select(
      (lit(Lambda0).as("lm") +:
        agreementCols.flatMap(f =>
          Seq(lit(M0).as(s"m_$f"), lit(U0).as(s"u_$f")))): _*)
    val zero = lit(0L).cast(dec)
    for (_ <- 1 to rounds) {
      val ms = agreementCols.map(f => col(s"m_$f"))
      val us = agreementCols.map(f => col(s"u_$f"))
      val g = census.crossJoin(broadcast(params))
        .withColumn("__g", gammaMicro(agree, col("lm"), ms, us))
      // M-step sums: exact integers; params = floor-div micro ratios.
      // Degenerate guards keep a parameter off the 0/1e6 boundary.
      val aggCols = sum(w).as("n") +:
        sum(w * col("__g").cast(dec)).as("sg") +:
        agreementCols.flatMap(f => Seq(
          sum(when(col(f), w * col("__g").cast(dec)).otherwise(zero))
            .as(s"sga_$f"),
          sum(when(col(f), w * lit(1000000L).cast(dec)).otherwise(zero))
            .as(s"sa_$f")))
      val sums = g.agg(aggCols.head, aggCols.tail: _*)
      params = sums.select(
        (expr("cast(sg div n as bigint)").as("lm") +:
          agreementCols.flatMap(f => Seq(
            expr(s"cast((sga_$f * 1000000) div " +
              "greatest(sg, cast(1 as decimal(38,0))) as bigint)")
              .as(s"m_$f"),
            expr(s"cast(((sa_$f - sga_$f) * 1000000) div " +
              "greatest(n * 1000000 - sg, " +
              s"cast(1 as decimal(38,0))) as bigint)").as(s"u_$f")))): _*)
    }
    val ms = agreementCols.map(f => col(s"m_$f"))
    val us = agreementCols.map(f => col(s"u_$f"))
    census.crossJoin(broadcast(params))
      .withColumn("__g", gammaMicro(agree, col("lm"), ms, us))
      .groupBy((col("lm") +: agreementCols.flatMap(f =>
        Seq(col(s"m_$f"), col(s"u_$f")))): _*)
      .agg(sum(w).cast("long").as("n_pairs"),
        sum(when(col("__g") > 500000L, w).otherwise(zero))
          .cast("long").as("n_matched"))
      .select((col("n_pairs") +: col("lm").as("lambda_micro") +:
        agreementCols.flatMap(f => Seq(col(s"m_$f").as(s"${f}_m_micro"),
          col(s"u_$f").as(s"${f}_u_micro"))) :+ col("n_matched")): _*)
  }
}
