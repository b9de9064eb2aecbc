package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Registry-wide WINDOW-GRAIN gate: no query may ship an unpartitioned
  * Window over a data-grain relation. An empty partition spec funnels
  * the whole relation through ONE task — the single-task scale cliff
  * the engine's conventions exist to prevent — yet nothing before this
  * spec inspected Window partitioning, which is how four such windows
  * shipped in rounds 8–10 despite the scan-shape gates.
  *
  * The gate walks every registry query's optimized logical plan (and
  * the physical plans cached under InMemoryRelations, and all
  * subqueries) at sf0.001 and fails on any Window whose partitionSpec
  * is empty unless the QUERY is allow-listed below with a grain
  * justification. The two tolerated grains, per the house convention:
  *
  *   - VALUE-DOMAIN CENSUS: the window rides one row per distinct
  *     value (never per data row) — ECDF/quantile/calibration shapes;
  *     bounded by the value domain, not the corpus.
  *   - STAT ROWS: the relation is ≤ K rows by construction (top-k
  *     candidates, per-bin/per-bucket summaries, date/hour grids).
  *
  * Everything else must re-express: orderBy().limit(k) for top-k, the
  * Pack/compactionPlan two-level prefix sum for cumsums,
  * Deciles.ntileExact for global tiles.
  */
class Round11WindowGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** query -> justification for every unpartitioned window it plans.
    * Each entry was audited at the source: the window's input relation
    * is a VALUE-DOMAIN CENSUS (one row per distinct value of a bounded
    * domain — grows with the value domain, not the corpus) or a ≤K-row
    * STAT relation (top-k limits, per-group/bin/stage summaries).
    * Adding a query here requires naming the census/stat relation and
    * why its cardinality is corpus-independent.
    */
  private val allowed: Map[String, String] = Map(
    // top-k / limited stat rows
    "q100_key_skew" -> "rank+cumshare over the limit(topN) key rows",
    "q157_zipf" -> "rank over the limit(topK) vocabulary head",
    "q175_vocab_coverage" -> "cumulative mass over the limit(topK) vocab head",
    "q213_session_paths" -> "rank over the limit(topN) path census head",
    "q232_shapley_attribution" ->
      "channel index over the event-type vocabulary (required <= 20)",
    // per-group / per-bin / per-stage summaries (groups are schema-,
    // config- or category-bounded, never row-bounded)
    "q145_anova" -> "grand-mean terms over the per-group summary rows",
    "q154_share_of_parent" -> "parent shares over the category census",
    "q195_source_influence" -> "LOO deltas over the per-source summary rows",
    "q203_group_sequential" -> "spending boundary over the stage grid rows",
    "q204_uplift_bins" -> "cum uplift over the fixed score-bin census",
    "q236_neyman_allocation" ->
      "largest-remainder ordering over the per-stratum summary rows",
    "q242_fdr_welch" -> "BH step-up over the per-test (metric-pair) rows",
    "q248_isotonic_calibration" ->
      "PAVA pool-adjacent over the fixed reliability-bin census",
    "q254_dunn_pairs" -> "rank-sum compare over the group-pair census",
    "q255_rake_weights" -> "margin scaling over the lang x source cell census",
    "q256_weight_ess" -> "ESS terms over the lang x source cell census",
    // value-domain censuses (distinct values of one column; ECDF /
    // order-statistic / contingency shapes)
    "q111_volume_anomaly" -> "rolling stats over the per-day census",
    "q112_benford" -> "digit shares over the 9-row leading-digit census",
    "q134_mutual_information" -> "cell terms over the contingency census",
    "q136_chi_square" -> "expected counts over the contingency census",
    "q141_quantile_norm" -> "rank map over per-group value censuses",
    "q156_pr_curve" -> "cum TP/FP over the distinct-score census",
    "q160_kaplan_meier" -> "at-risk cumsum over the event-time census",
    "q163_rfm" -> "quintile boundaries over metric value censuses",
    "q192_best_split" -> "split scan over the distinct-threshold census",
    "q206_log_rank" -> "at-risk cumsum over the event-time census",
    "q217_spearman" -> "ranks over the two value-domain censuses",
    "q220_cross_correlation" -> "alignment over the bounded lag grid",
    "q237_average_precision" -> "cum precision over the distinct-score census",
    "q250_cochran_armitage" ->
      "ntileExact bucket offsets over the n_chars value census",
    "q267_conformal" -> "calibration quantile over the score census",
    "q269_nelson_aalen" -> "hazard cumsum over the event-time census")

  private def emptySpecWindows(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def phys(p: SparkPlan): Seq[String] = p.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(s"cached physical Window over ${w.child.nodeName}")
      case a: AdaptiveSparkPlanExec => phys(a.executedPlan)
      case q: QueryStageExec => phys(q.plan)
      case s: InMemoryTableScanExec => phys(s.relation.cachedPlan)
    }.flatten
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LWindow if w.partitionSpec.isEmpty =>
        Seq(s"logical Window over ${w.child.nodeName}")
      case m: InMemoryRelation => phys(m.cachedPlan)
    }.flatten
  }

  test("every registry query plans no unpartitioned Window, or is " +
    "allow-listed with a grain justification") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val ws =
          try emptySpecWindows(fn(spark, sf))
          catch { case e: Throwable => Seq(s"probe error: ${e.getMessage}") }
        graft.util.Caches.releaseAll()
        spark.sharedState.cacheManager.clearCache()
        if (ws.isEmpty || allowed.contains(name)) Nil
        else Seq(s"$name: ${ws.mkString("; ")}")
    }
    assert(violations.isEmpty,
      "unpartitioned windows outside the allow-list:\n" +
        violations.mkString("\n"))
    // the allow-list must not go stale: every entry still plans at
    // least one unpartitioned window (drop the entry when the shape
    // is rebuilt) and still names a real query
    val stale = allowed.keys.toSeq.sorted.filter { name =>
      !SparkEntry.queries.contains(name) ||
        emptySpecWindows(SparkEntry.queries(name)(spark, sf)).isEmpty
    }
    graft.util.Caches.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    assert(stale.isEmpty, s"stale allow-list entries: $stale")
  }
}
