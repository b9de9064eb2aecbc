package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits over training-data tables.
  *
  * Before an event log or user table ships into a training corpus, the
  * standard re-identification questions are k-anonymity (does any
  * quasi-identifier combination isolate fewer than k records?) and the
  * identity-diversity of each class (does a class map to a SINGLE
  * subject? — the l-diversity=1 failure, where "anonymized" rows
  * deterministically reveal who acted).
  *
  * The audit is one groupBy over the quasi-identifier columns — a single
  * scan, aggregation fully partial (map-side combine), output bounded by
  * the QI-domain cardinality, never row count. No windows, no joins.
  */
object Privacy {

  /** Per-equivalence-class k-anonymity census: for every observed
    * quasi-identifier combination, the row count, the number of distinct
    * subjects (`idCol`), and the two violation flags —
    * `k_violation` (class has < k rows: the classic k-anonymity breach)
    * and `single_id` (all rows in the class belong to one subject: any
    * attacker who can form the QI key learns WHO).
    *
    * Callers roll this up further at will (violation counts, % rows at
    * risk); the class-level relation is the audit artifact reviewers
    * need — which slices leak, not just how many.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      idCol: String, k: Long): DataFrame = {
    val cls = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_ids"))
    cls
      .withColumn("k_violation", col("n_rows") < k)
      .withColumn("single_id", col("n_ids") === 1L)
      .orderBy(quasiCols.map(col): _*)
  }

  /** Per-class l-diversity census — k-anonymity's complement for the
    * SENSITIVE attribute: a class can hold plenty of rows (k-safe) while
    * every row shares one sensitive value, so forming the QI key still
    * reveals the secret (the homogeneity attack). Distinct-l diversity
    * asks every class to carry ≥ l distinct sensitive values.
    *
    * Shape: the (quasi, sensitive) census first — ONE scan, partial
    * aggregation — then a stat-grain re-aggregation per class for the
    * row count, distinct-value count, and the modal value's frequency
    * (`max_freq`, the homogeneity measure: max_freq = n_rows ⇔ the
    * class is pure). No corpus-row distinct, no windows.
    *
    * Output per class: (quasi..., n_rows, n_sensitive, max_freq,
    * l_violation, homogeneous).
    */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    val census = df
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__c"))
    census
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__c").as("n_rows"),
        count(lit(1)).as("n_sensitive"),
        max("__c").as("max_freq"))
      .withColumn("l_violation", col("n_sensitive") < l)
      .withColumn("homogeneous", col("n_sensitive") === 1L)
      .orderBy(quasiCols.map(col): _*)
  }

  /** Per-class t-closeness census — the third rung of the privacy
    * ladder: a class can be k-safe AND l-diverse while its sensitive
    * distribution still differs sharply from the table's (an attacker
    * forming the QI key learns the class skew — the skewness attack).
    * t-closeness bounds the distance between each class's sensitive
    * distribution and the GLOBAL one; for categorical attributes the
    * distance is total variation, `TV = ½ Σᵥ |p_class(v) − p_global(v)|`.
    *
    * Exact integer core: `TV·2·n_c·N = Σᵥ |cᵥ·N − gᵥ·n_c|`, and the
    * values a class never holds contribute `n_c·(N − Σ_{v∈class} gᵥ)`
    * in ONE closed form — no class×value grid materializes. Products
    * accumulate in DECIMAL(38,0) (≡ HUGEINT; cᵥ·N reaches N² at the
    * envelope); the milli TV is one floor division of exact integers.
    *
    * Shape: the same (quasi, sensitive) census as [[lDiversityReport]]
    * (ONE scan), the global per-value census re-aggregated from it
    * (stat-grain), one broadcast join by value, one per-class
    * aggregate. Output per class: (quasi..., n_rows, tv_milli,
    * t_violation) with t_violation = tv_milli > tMilli.
    */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tMilli: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = graft.util.Caches.cached(df
      .groupBy((quasiCols.map(col) :+
        col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).as("__c")))
    val global = census.groupBy("__v").agg(sum("__c").as("__g"))
      .crossJoin(broadcast(census.agg(sum("__c").as("__nt"))))
    census
      // class totals via a window over the CENSUS (stat-grain, one row
      // per distinct quasi×value), never over data rows
      .withColumn("__nc",
        sum("__c").over(Window.partitionBy(quasiCols.map(col): _*)))
      .join(broadcast(global), Seq("__v"))
      .groupBy(quasiCols.map(col): _*)
      .agg(max("__nc").as("n_rows"),
        sum(abs(col("__c").cast("decimal(38,0)") * col("__nt") -
          col("__g").cast("decimal(38,0)") * col("__nc")))
          .as("__present"),
        first("__nt").as("__ntot"),
        sum("__g").as("__g_present"))
      .withColumn("tv_milli",
        expr("cast(((__present + cast(n_rows as decimal(38,0)) * " +
          "(__ntot - __g_present)) * 500) div " +
          "(cast(n_rows as decimal(38,0)) * __ntot) as bigint)"))
      .select((quasiCols.map(col) :+ col("n_rows") :+ col("tv_milli") :+
        (col("tv_milli") > tMilli).as("t_violation")): _*)
      .orderBy(quasiCols.map(col): _*)
  }

  /** Laplace-mechanism COUNT histogram (public method: Dwork,
    * McSherry, Nissim & Smith 2006): per key, the true count plus
    * Laplace(Δf/ε) noise with sensitivity 1 — the ε-DP release for a
    * partition-count query. Noise here derives DETERMINISTICALLY from
    * the keyed rolling hash (+ `salt`): inverse-CDF
    * `−b·sign(u−½)·ln(1−2|u−½|)` over the hash-uniform u, so the
    * release is reproducible and cross-engine testable. THE HONESTY
    * LINE: a salt reused across releases forfeits the DP guarantee —
    * production must draw a fresh salt (or real randomness) per
    * release and publish ONLY the released column; the true count is
    * emitted here for the test harness.
    *
    * Exactness: u = hash/mod is an exact rational; the one ln/double
    * expression rounds to micro on both engines (the q174 nano
    * convention). u is clamped away from ½ by one hash step so the
    * ln argument is never 0.
    *
    * Output per key: (key, n, lap_micro, n_released), key-ordered.
    */
  def dpHistogram(df: DataFrame, keyCol: String, epsilonPermille: Long,
      salt: Long = 0L): DataFrame = {
    require(epsilonPermille >= 1, "epsilon must be positive")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("lap_micro", laplaceMicro(
        concat(col("key").cast("string"), lit("#" + salt)),
        1000.0 / epsilonPermille))
      .select(col("key").as(keyCol), col("n"), col("lap_micro"),
        (col("n") + expr("lap_micro div 1000000")).as("n_released"))
      .orderBy(keyCol)
  }

  /** The deterministic Laplace draw shared by the batch release and
    * [[graft.streaming.StreamingOps.dpCountsStream]]: micro-quantized
    * inverse-CDF noise with scale `b` off the rolling hash of `seed`
    * — one shared expression so the two paths are bit-identical for
    * the same seed.
    */
  private[graft] def laplaceMicro(seed: Column, b: Double): Column = {
    val mod = TextOps.HashMod
    val u = (((TextOps.rollingHash(seed) % mod) + mod) % mod)
      .cast("double") / mod.toDouble
    round((lit(-b) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) *
        greatest(abs(u - 0.5) - lit(1.0 / mod), lit(0.0))))
      * lit(1e6)).cast("long")
  }
}
