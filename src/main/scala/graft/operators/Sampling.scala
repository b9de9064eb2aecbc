package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus construction.
  *
  * The reference samples with warehouse-side `SAMPLE BLOCK (p)`
  * (`/root/reference/Snowflake/snowflake_table_monitor.py:50-54`) —
  * non-reproducible across engines. Training-data pipelines need the
  * opposite: a sample any engine recomputes bit-identically (so reruns,
  * audits and the DuckDB oracle agree). Both operators below order by a
  * Knuth multiplicative hash of the id — a deterministic pseudo-random
  * total order — instead of `rand()`.
  *
  * Scale shape: `quotaSample` is a per-group top-k, built on the
  * [[graft.functions.TopKBy]] aggregate rather than a
  * `row_number() OVER (PARTITION BY group)` window: partial aggregation
  * keeps a bounded k-heap per group per partition, so the shuffle moves
  * ≤k rows per group and NO group is ever sorted whole on one task —
  * safe even when a single source is corpus-sized (the window
  * formulation would serialize that source's full sort onto one
  * reducer, the q58/q65 hazard class).
  */
object Sampling {

  val HashMod = 1000000007L

  /** Knuth multiplicative hash → [0, 1e9+7). The id is reduced mod p
    * BEFORE the multiply — mathematically identical ((id·c) mod p =
    * ((id mod p)·c) mod p) but overflow-safe for the FULL long id domain:
    * the naive (id * c) % p silently wraps in Spark above ~3.46e9 (ids a
    * billion-doc corpus reaches) while DuckDB errors, a silent
    * engine divergence. (p-1)·c ≈ 2.7e18 stays inside Long.
    */
  def idHash(id: Column): Column =
    ((id % lit(HashMod)) * lit(2654435761L)) % lit(HashMod)

  /** Keep at most `k` rows per group, chosen by hash rank — a fixed
    * per-domain quota (the "cap any one source's share" rule of corpus
    * mixing). Output keeps the hash rank as `rank` (1-based).
    *
    * The k smallest (hash, id) pairs are the k LARGEST negated pairs, so
    * the [[graft.functions.TopKBy]] descending aggregate yields exactly
    * the window formulation's rows and ranks (ids are non-negative and
    * unique, making the order total). All non-group columns ride in the
    * aggregated struct — ≤k full rows per group cross the exchange.
    * Columns must be orderable (no maps) — true of the corpus tables.
    */
  def quotaSample(df: DataFrame, groupCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    import graft.functions.TopKBy.topKBy
    val payloadCols = df.columns.filterNot(_ == groupCol).toSeq
    val ordered = struct(
      (-idHash(col(idCol))).as("__nh") +: (-col(idCol)).as("__nid") +:
        payloadCols.map(col): _*)
    df.groupBy(col(groupCol))
      .agg(topKBy(ordered, k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(groupCol) +: payloadCols.map(c => col(s"__t.$c").as(c)) :+
        (col("__pos") + 1).cast("int").as("rank"): _*)
  }

  /** Deterministic fraction sample: keep rows whose id-hash falls below
    * `fraction` of the hash space — stateless, no shuffle at all (pure
    * filter, pushed into the scan stage), stable under reruns and
    * appends (a row's fate never depends on other rows).
    */
  def hashSample(df: DataFrame, fraction: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    df.filter(idHash(col(idCol)) < lit((HashMod * fraction).toLong))
  }

  /** Stratified deterministic sample: per-stratum keep rates (corpus
    * mixing by RATE where [[quotaSample]] mixes by absolute count).
    * Same scan-stage hash filter as [[hashSample]] — the stratum only
    * selects the threshold, so there is still no shuffle and no window;
    * unlisted strata fall back to `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, groupCol: String,
      rates: Map[String, Double], defaultRate: Double,
      idCol: String = "doc_id"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, "rates in [0,1]"))
    // deterministic CASE order (sorted keys) so plans are stable
    val thr = rates.toSeq.sortBy(_._1)
      .foldRight(lit((HashMod * defaultRate).toLong): Column) {
        case ((g, r), acc) =>
          when(col(groupCol) === g, lit((HashMod * r).toLong)).otherwise(acc)
      }
    df.filter(idHash(col(idCol)) < thr)
  }

  /** Deterministic WEIGHTED sample of k rows (Efraimidis–Spirakis via
    * exponential keys): row i draws uᵢ from its id-hash and gets key
    * −ln(uᵢ)/wᵢ — an Exp(wᵢ) variate — and the k SMALLEST keys win, so
    * inclusion probability is proportional to weight. Importance
    * sampling for corpus mixing (weight = token count, quality score…)
    * with the same replay-stable determinism as [[hashSample]].
    *
    * Numerics for the oracle: u = (idHash+1)/(HashMod+1) ∈ (0,1] (never
    * 0, so ln is finite); the key is quantized to integer micro-points
    * and ties break on the id, so the top-k cut is a total order.
    * Zero/negative weights are excluded (their keys would be ±Inf/NaN,
    * whose ordering is engine-specific — and a zero-weight row should
    * never be sampled anyway).
    *
    * Scale shape: key assignment is scan-stage arithmetic; the global
    * top-k is `orderBy(key).limit(k)` — Spark plans TakeOrdered (per-
    * partition heads + driver merge), never a single-task global sort.
    */
  def weightedSample(df: DataFrame, weightCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val u = (idHash(col(idCol)) + lit(1L)) / lit(HashMod + 1L)
    val keyMicro = round((-log(u) / col(weightCol)) * lit(1000000.0))
      .cast("long")
    df.filter(col(weightCol) > 0)
      .withColumn("key_micro", keyMicro)
      .orderBy(col("key_micro"), col(idCol))
      .limit(k)
  }

  /** Effective sample size under importance weights — Kish's
    * `ESS = (Σw)²/Σw²` per group: how many EQUAL-weight examples the
    * weighted set is statistically worth. The reweighting-cost
    * diagnostic a mixture designer reads next to [[weightedSample]]:
    * an aggressive upweighting that halves ESS bought variance, not
    * data.
    *
    * Integer cores: weights quantize to milli, Σw stays Long, Σw² in
    * DECIMAL(38,0) ≡ the oracle's HUGEINT; ESS and the ESS/n ratio
    * derive identically in SQL at 6 dp (the ratio divides the ROUNDED
    * ess, so both engines round the same boundary once). One scan,
    * stat grain.
    *
    * Output: (group, n_rows, sum_w_milli, ess, ess_ratio); NULL on
    * all-zero weights.
    */
  def essReport(df: DataFrame, groupCol: String,
      weightCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val wm = round(col(weightCol).cast("double") * 1e3).cast("long")
    val ess = round((col("sw").cast("double") * col("sw")) /
      col("sww").cast("double"), 6)
    df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_rows"), sum(wm).as("sw"),
        sum(wm.cast(dec) * wm.cast(dec)).as("sww"))
      .select(col("g").as(groupCol), col("n_rows"),
        col("sw").as("sum_w_milli"),
        when(col("sww") > 0, ess).as("ess"))
      .withColumn("ess_ratio",
        when(col("ess").isNotNull,
          round(col("ess") / col("n_rows"), 6)))
      .orderBy(groupCol)
  }

  /** NEYMAN ALLOCATION (public method: Neyman 1934) — how a fixed
    * sample budget should split across strata: n_h ∝ N_h·σ_h, so big
    * AND volatile strata get the samples while huge-but-constant
    * strata don't waste them (the flaw of proportional allocation
    * this fixes). The design step upstream of [[stratifiedSample]].
    *
    * Exactness: σ_h comes from exact DECIMAL sums
    * (population form, √((n·Σx² − (Σx)²)/n²)) and quantizes to a
    * micro weight; floor shares `budget·w_h div Σw` hand their
    * remainders out largest-remainder-first (tie: stratum asc — the
    * Hamilton method over ≤ |strata| stat rows), so the allocations
    * sum EXACTLY to the budget. Allocations are NOT capped at N_h
    * (Neyman can oversample a small volatile stratum; the n_alloc >
    * n_rows comparison is the signal to redesign) — documented,
    * mirrored. Constant strata (σ = 0) get weight 0.
    *
    * Output per stratum: (stratum, n_rows, sigma_micro, alloc),
    * stratum-ordered; Σ alloc = budget whenever Σw > 0.
    */
  def neymanAllocation(df: DataFrame, stratumCol: String,
      valCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "budget")
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e6).cast("long")
    val s = df.groupBy(col(stratumCol).as("g"))
      .agg(count(lit(1)).as("n_rows"), sum(vm.cast(dec)).as("sx"),
        sum(vm.cast(dec) * vm.cast(dec)).as("sxx"))
      .select(col("g"), col("n_rows"),
        round(sqrt((col("n_rows").cast(dec) * col("sxx") -
          col("sx") * col("sx")).cast("double")) /
          col("n_rows").cast("double")).cast("long").as("sigma_micro"))
      // DECIMAL: N_h·σ_micro brushes long range at 10⁹-row strata
      .withColumn("w", col("n_rows").cast(dec) * col("sigma_micro"))
    val tw = s.agg(sum(col("w").cast(dec)).as("tw"),
      count(lit(1)).as("n_strata"))
    val shares = s.crossJoin(broadcast(tw))
      .withColumn("fl", when(col("tw") > 0,
        expr(s"cast((cast(w as decimal(38,0)) * $budget) div tw " +
          "as long)")).otherwise(lit(0L)))
      .withColumn("rem", when(col("tw") > 0,
        expr(s"cast((cast(w as decimal(38,0)) * $budget) % tw " +
          "as decimal(38,0))")).otherwise(lit(0).cast(dec)))
    val short = shares.agg((lit(budget) - sum("fl")).as("short"))
    import org.apache.spark.sql.expressions.Window
    shares.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("g").asc)))
      .select(col("g").as(stratumCol), col("n_rows"),
        col("sigma_micro"),
        (col("fl") + when(col("rk") <= col("short") && col("tw") > 0,
          1L).otherwise(0L)).as("alloc"))
      .orderBy(stratumCol)
  }
}
