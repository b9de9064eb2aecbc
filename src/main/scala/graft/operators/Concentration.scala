package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration of a non-negative measure per group — the scalar
  * inequality summary behind "is this corpus dominated by a few huge
  * documents / is this source's token mass concentrated?" audits
  * (SkewReport names the top keys; Gini grades the WHOLE distribution,
  * comparable across groups of different size).
  *
  * Definition (population Gini over sorted values x₍₁₎≤…≤x₍ₙ₎):
  * G = Σᵢ(2i−n−1)·x₍ᵢ₎ / (n·Σx). Computed in the VALUE DOMAIN: the
  * per-(group, value) histogram collapses ties, and a tied run of count
  * c starting after cumulative count `cum` contributes exactly
  * v·c·(2·cum + c − n) to the numerator (Σ(2i−n−1) telescoped over the
  * run) — so the rank window runs over DISTINCT values per group, not
  * corpus rows, and tie order can't perturb the sum (it's invariant by
  * construction). ONE scan, one histogram aggregate, windows over stat
  * rows only.
  *
  * Integer core: `gini_num` accumulates in DECIMAL(38,0) (v·c·n headroom
  * exceeds a long once n·v passes ~10¹⁸) and lands as an exact BIGINT;
  * `gini` divides by n·Σx in double at 6 dp.
  */
object Concentration {

  /** (group, n_rows, sum_val, gini_num, gini) per group, group-ordered. */
  def giniReport(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val h = df
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy("g")
    val wOrd = wg.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = col("v").cast(dec) * col("c").cast(dec) *
      (lit(2).cast(dec) * col("cum").cast(dec) + col("c") - col("n"))
    h
      .withColumn("cum", coalesce(sum("c").over(wOrd), lit(0L)))
      .withColumn("n", sum("c").over(wg))
      .withColumn("total", sum(col("v") * col("c")).over(wg))
      .groupBy("g")
      .agg(
        max("n").as("n_rows"),
        max("total").as("sum_val"),
        sum(contrib).cast("long").as("gini_num"))
      .withColumn("gini",
        when(col("sum_val") > 0, round(
          col("gini_num").cast("double") /
            (col("n_rows").cast("double") * col("sum_val")), 6)))
      .select(col("g").as(groupCol), col("n_rows"), col("sum_val"),
        col("gini_num"), col("gini"))
      .orderBy(groupCol)
  }

  /** Shannon diversity of a categorical composition per group — the
    * mixture-balance audit ([[giniReport]] grades a numeric measure's
    * inequality; this grades a CATEGORY mix): per group the entropy H
    * over category shares, its exponential (the "effective number of
    * categories" — 10 languages at 1% ≠ 10 languages balanced), and
    * Pielou evenness H/ln(k) ∈ [0, 1].
    *
    * House nano-nat convention: each census cell contributes
    * `round(−(c/n)·ln(c/n)·10⁹)` BEFORE the per-group Σ, so H is a
    * combine-order-free integer and eff/evenness derive from it with
    * the identical expression in the oracle. ONE scan to the (group,
    * category) census; re-aggregation at stat grain; no windows.
    *
    * Output: (group, n_rows, n_cats, h_nano, eff_cats, evenness) —
    * evenness NULL for single-category groups.
    */
  def diversityReport(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val census = df
      .select(col(groupCol).as("g"), col(catCol).as("cat"))
      .groupBy("g", "cat").agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy("g")
    val cell = round(-(col("c") / col("n")) *
      log(col("c") / col("n")) * lit(1e9)).cast("long")
    census
      .withColumn("n", sum("c").over(wg))
      .withColumn("k", count(lit(1)).over(wg))
      .groupBy("g", "n", "k")
      .agg(sum(cell).as("h_nano"))
      .select(col("g").as(groupCol), col("n").as("n_rows"),
        col("k").as("n_cats"), col("h_nano"),
        round(exp(col("h_nano") / lit(1e9)), 6).as("eff_cats"),
        when(col("k") > 1, round(
          (col("h_nano") / lit(1e9)) / log(col("k").cast("double")), 6))
          .as("evenness"))
      .orderBy(groupCol)
  }

  /** Herfindahl–Hirschman concentration of a categorical composition —
    * the Σshare² sibling of [[diversityReport]] (entropy weights rare
    * categories; HHI weights DOMINANT ones, which is why market
    * regulators use it): per group `HHI = Σ (c_i/n)²` and its inverse,
    * the effective number of equal competitors.
    *
    * Integer cores: n and Σc² (DECIMAL(38,0) ≡ oracle HUGEINT); HHI
    * and eff_n derive identically in SQL at 6 dp. One scan, stat-grain
    * re-aggregation.
    *
    * Output: (group, n_rows, n_cats, sum_sq, hhi, eff_n).
    */
  def hhiReport(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val hhi = round(col("sum_sq").cast("double") /
      (col("n").cast("double") * col("n")), 6)
    val eff = round((col("n").cast("double") * col("n")) /
      col("sum_sq").cast("double"), 6)
    df.select(col(groupCol).as("g"), col(catCol).as("cat"))
      .groupBy("g", "cat").agg(count(lit(1)).as("c"))
      .groupBy("g")
      .agg(sum("c").as("n"), count(lit(1)).as("k"),
        sum(col("c").cast(dec) * col("c").cast(dec)).cast("long")
          .as("sum_sq"))
      .select(col("g").as(groupCol), col("n").as("n_rows"),
        col("k").as("n_cats"), col("sum_sq"), hhi.as("hhi"),
        eff.as("eff_n"))
      .orderBy(groupCol)
  }

  /** Leave-one-group-out influence: how much does EACH slice pull the
    * corpus-wide mean — `influence_g = mean_all − mean_without_g` —
    * the jackknife "which source drives this metric" audit run before
    * blaming a global drift on the whole corpus.
    *
    * Pure stat math: per-group exact (n, Σmilli) cores plus the grand
    * totals as window sums over the G stat rows; the three means and
    * the influence derive identically in SQL at 6 dp. One scan, no
    * joins. A positive influence = the group pulls the mean UP.
    *
    * Output: (group, n_g, s_g_milli, mean_all_milli, mean_wo_milli,
    * influence_milli), group-ordered; NULL when the group IS the
    * corpus.
    */
  def influenceReport(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val vm = round(col(valCol).cast("double") * 1e3).cast("long")
    val wAll = Window.partitionBy()
    val meanAll = round(col("s_all").cast("double") / col("n_all"), 6)
    val meanWo = round((col("s_all") - col("s_g")).cast("double") /
      (col("n_all") - col("n_g")), 6)
    df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_g"), sum(vm).as("s_g"))
      .withColumn("n_all", sum("n_g").over(wAll))
      .withColumn("s_all", sum("s_g").over(wAll))
      .select(col("g").as(groupCol), col("n_g"),
        col("s_g").as("s_g_milli"),
        meanAll.as("mean_all_milli"),
        when(col("n_all") > col("n_g"), meanWo).as("mean_wo_milli"),
        when(col("n_all") > col("n_g"),
          round(meanAll - meanWo, 6)).as("influence_milli"))
      .orderBy(groupCol)
  }

  /** Audience-overlap matrix — for every pair of segment labels, how
    * many subjects belong to BOTH: the "do these event types reach the
    * same users / do these sources cover the same documents" reading,
    * with the Jaccard in ppm for size-comparable overlap.
    *
    * Exact set intersection, no sketches: the distinct (subject,
    * label) relation (ONE aggregate), then a subject-keyed self-join
    * whose fan-out per subject is C(labels-of-subject, 2) — bounded by
    * the LABEL cardinality squared, never by subjects (the label
    * column must be a bounded segment vocabulary, same contract as
    * every groupBy key here; for unbounded label spaces use the HLL
    * inclusion–exclusion route instead). Per-label totals broadcast
    * onto the L² pair stat rows.
    *
    * Output per (label_a < label_b): (label_a, label_b, n_a, n_b,
    * n_both, jaccard_ppm), pair-ordered. Label pairs with no common
    * subject emit nothing.
    */
  def audienceOverlap(events: DataFrame, labelCol: String = "event_type",
      subjectCol: String = "user_id"): DataFrame = {
    val m = graft.util.Caches.cached(events
      .select(col(subjectCol).as("u"), col(labelCol).as("l"))
      .distinct())
    val sizes = m.groupBy("l").agg(count(lit(1)).as("n"))
    val both = m.as("a")
      .join(m.as("b"), col("a.u") === col("b.u") &&
        col("a.l") < col("b.l"))
      .groupBy(col("a.l").as("label_a"), col("b.l").as("label_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(sizes.select(col("l").as("label_a"),
        col("n").as("n_a"))), Seq("label_a"))
      .join(broadcast(sizes.select(col("l").as("label_b"),
        col("n").as("n_b"))), Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("n_both"),
        expr("(n_both * 1000000L) div (n_a + n_b - n_both)")
          .as("jaccard_ppm"))
      .orderBy("label_a", "label_b")
  }
}
