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

  /** Grain class of an allow-listed window input. The gate ENFORCES
    * the typing: only `ValueBounded` and `StatK` entries are legal —
    * an `EntityDerived` entry (census cardinality grows with rows:
    * per-entity totals, micro-rounded continuous values) fails the
    * gate with a pointer to the PrefixSum rebuild. Round 12 audited
    * every entry with the one question "does the census cardinality
    * grow with rows?" and rebuilt the five that did (q217 per-user
    * spend ranks, q254 micro-value ranks, q163 per-user metric
    * histograms, q267 micro-nonconformity census, q250 ntileExact
    * offsets) on `PrefixSum.cumBefore` — they are gone from this list
    * because their plans no longer hold ANY unpartitioned window.
    */
  private sealed trait Grain
  private case object ValueBounded extends Grain // bounded value domain
  private case object StatK extends Grain // <= K rows by construction
  private case object EntityDerived extends Grain // ILLEGAL — rebuild

  /** query -> (grain class, justification) for every unpartitioned
    * window it plans. Each entry was audited at the source: the
    * window's input relation is a VALUE-DOMAIN CENSUS over a BOUNDED
    * domain (digit grids, day grids, n_chars/cents histograms —
    * cardinality saturates at the domain size, independent of rows) or
    * a ≤K-row STAT relation (top-k limits, per-group/bin/stage
    * summaries). Adding a query here requires naming the census/stat
    * relation, typing its grain, and saying why its cardinality is
    * corpus-independent; the value-bounded operator sites additionally
    * carry the Guards.boundedCensus runtime ceiling, so a drifted
    * domain fails loudly in-plan, not just in this audit.
    */
  private val allowed: Map[String, (Grain, String)] = Map(
    // top-k / limited stat rows
    "q100_key_skew" ->
      (StatK, "rank+cumshare over the limit(topN) key rows"),
    "q157_zipf" -> (StatK, "rank over the limit(topK) vocabulary head"),
    "q175_vocab_coverage" ->
      (StatK, "cumulative mass over the limit(topK) vocab head"),
    "q213_session_paths" ->
      (StatK, "rank over the limit(topN) path census head"),
    "q232_shapley_attribution" ->
      (StatK, "channel index over the event-type vocabulary (<= 20)"),
    // per-group / per-bin / per-stage summaries (groups are schema-,
    // config- or category-bounded, never row-bounded)
    "q145_anova" ->
      (StatK, "grand-mean terms over the per-group summary rows"),
    "q154_share_of_parent" ->
      (StatK, "parent shares over the category census"),
    "q195_source_influence" ->
      (StatK, "LOO deltas over the per-source summary rows"),
    "q203_group_sequential" ->
      (StatK, "spending boundary over the stage grid rows"),
    "q204_uplift_bins" ->
      (StatK, "cum uplift over the fixed score-bin census"),
    "q236_neyman_allocation" ->
      (StatK, "largest-remainder ordering over the per-stratum rows"),
    "q242_fdr_welch" ->
      (StatK, "BH step-up over the per-test (metric-pair) rows"),
    "q248_isotonic_calibration" ->
      (StatK, "PAVA pool-adjacent over the fixed reliability-bin census"),
    "q255_rake_weights" ->
      (StatK, "margin scaling over the lang x source cell census"),
    "q256_weight_ess" ->
      (StatK, "ESS terms over the lang x source cell census"),
    "q220_cross_correlation" ->
      (StatK, "alignment over the bounded lag grid"),
    // value-domain censuses over BOUNDED domains (ECDF /
    // order-statistic / contingency shapes); each backing operator
    // carries the boundedCensus runtime ceiling
    "q111_volume_anomaly" ->
      (ValueBounded, "rolling stats over the per-day census " +
        "(calendar-bounded)"),
    "q112_benford" ->
      (ValueBounded, "digit shares over the 9-row leading-digit census"),
    "q134_mutual_information" ->
      (ValueBounded, "cell terms over the lang x source contingency " +
        "census (schema-bounded categories)"),
    "q136_chi_square" ->
      (ValueBounded, "expected counts over the contingency census " +
        "(schema-bounded categories)"),
    "q141_quantile_norm" ->
      (ValueBounded, "rank map over per-group n_chars censuses " +
        "(saturates at max doc length; boundedCensus-guarded)"),
    "q156_pr_curve" ->
      (ValueBounded, "cum TP/FP over the n_chars threshold census " +
        "(saturates at max doc length; boundedCensus-guarded)"),
    "q160_kaplan_meier" ->
      (ValueBounded, "at-risk cumsum over the DAY-grain lifetime " +
        "census (calendar-bounded; boundedCensus-guarded)"),
    "q192_best_split" ->
      (ValueBounded, "split scan over the n_chars threshold census " +
        "(saturates at max doc length; boundedCensus-guarded)"),
    "q206_log_rank" ->
      (ValueBounded, "at-risk cumsum over the DAY-grain lifetime " +
        "census (calendar-bounded; boundedCensus-guarded)"),
    "q237_average_precision" ->
      (ValueBounded, "cum precision over the CENTS-grain score census " +
        "(saturates at the bounded price domain; boundedCensus-guarded)"),
    "q269_nelson_aalen" ->
      (ValueBounded, "hazard cumsum over the DAY-grain lifetime " +
        "census (calendar-bounded; boundedCensus-guarded)"))

  import org.apache.spark.sql.execution.SparkPlan

  /** Round-13 (verdict task 5): the gate VERIFIES the guards it cites.
    * Every ValueBounded allow-list entry that justifies itself with
    * "boundedCensus-guarded" must actually plan the guard — the
    * `raise_error` filter `Guards.boundedCensus` threads in — in the
    * query's own plans (optimized, cached, or construction-executed).
    * Without this check a refactor could drop a guard silently while
    * the justification text kept claiming it (round-12 verdict's
    * "missing #5"). raise_error appears nowhere else in main
    * (re-grepped round 13), so its presence IS the guard's.
    */
  private def exprHasRaise(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.exists {
      case _: org.apache.spark.sql.catalyst.expressions.RaiseError => true
      case _ => false
    }

  private def physHasGuard(p: SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    p.collectWithSubqueries {
      case n if n.expressions.exists(exprHasRaise) => true
      case a: AdaptiveSparkPlanExec if physHasGuard(a.executedPlan) => true
      case q: QueryStageExec if physHasGuard(q.plan) => true
      case s: InMemoryTableScanExec
        if physHasGuard(s.relation.cachedPlan) => true
    }.nonEmpty
  }

  private def logicalHasGuard(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case n if n.expressions.exists(exprHasRaise) => true
      case m: InMemoryRelation if physHasGuard(m.cachedPlan) => true
    }.nonEmpty
  }

  /** Round-14 (verdict optional task 8): the guard walk ALSO asserts
    * the guard's census relation is CACHED. `Guards.boundedCensus`
    * computes its cardinality count as a second aggregate over the
    * census — if the caller passed an uncached census, that count
    * re-runs the whole upstream pipeline (the double-scan hazard the
    * r12 verdict audited by hand). The count aggregate is identifiable
    * by its `__census_n` output; its leaves must all be in-memory /
    * local scans, never a file source.
    */
  private def physLeavesDeep(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    p.collectLeaves().flatMap {
      case a: AdaptiveSparkPlanExec => physLeavesDeep(a.executedPlan)
      case q: QueryStageExec => physLeavesDeep(q.plan)
      case r: ReusedExchangeExec => physLeavesDeep(r.child)
      case l => Seq(l)
    }
  }

  private def badGuardLeafPhys(p: SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.{LocalTableScanExec, RDDScanExec}
    p.collectWithSubqueries {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
        if a.output.exists(_.name == "__census_n") =>
        physLeavesDeep(a).collect {
          case l if !(l.isInstanceOf[InMemoryTableScanExec] ||
            l.isInstanceOf[LocalTableScanExec] ||
            l.isInstanceOf[RDDScanExec]) => l.nodeName
        }
      case ad: AdaptiveSparkPlanExec => badGuardLeafPhys(ad.executedPlan)
      case q: QueryStageExec => badGuardLeafPhys(q.plan)
    }.flatten
  }

  private def badGuardLeafLogical(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case a: Aggregate if a.output.exists(_.name == "__census_n") =>
        a.collectLeaves().collect {
          case l if !(l.isInstanceOf[InMemoryRelation] ||
            l.isInstanceOf[LocalRelation]) => l.nodeName
        }
      case m: InMemoryRelation => badGuardLeafPhys(m.cachedPlan)
    }.flatten
  }

  private def physWindows(p: SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    p.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(s"physical Window over ${w.child.nodeName}")
      case a: AdaptiveSparkPlanExec => physWindows(a.executedPlan)
      case q: QueryStageExec => physWindows(q.plan)
      case s: InMemoryTableScanExec => physWindows(s.relation.cachedPlan)
    }.flatten
  }

  private def emptySpecWindows(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LWindow if w.partitionSpec.isEmpty =>
        Seq(s"logical Window over ${w.child.nodeName}")
      case m: InMemoryRelation => physWindows(m.cachedPlan)
    }.flatten
  }

  /** The gate's round-12 second eye: queries that FINISH DRIVER-SIDE
    * (countedCollect stat reductions, staging e2e runs) execute their
    * window plans during CONSTRUCTION, so the returned DataFrame's
    * plan never shows them — exactly how kruskalWallis's value-census
    * window escaped rounds 8–11. A QueryExecutionListener records
    * every unpartitioned physical Window of every plan executed while
    * the query function runs.
    */
  private val constructed =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val constructedGuard =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  private val constructedUncachedGuard =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val constructionListener = {
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        physWindows(qe.executedPlan)
          .foreach(w => constructed.add(s"$w [executed at construction]"))
        if (physHasGuard(qe.executedPlan)) constructedGuard.set(true)
        badGuardLeafPhys(qe.executedPlan)
          .foreach(s => constructedUncachedGuard.add(s))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    l
  }

  private def constructionWindows(body: => Unit): Seq[String] = {
    constructionListener // ensure registered once
    TestSpark.drainListenerBus()
    constructed.clear()
    constructedGuard.set(false)
    body
    TestSpark.drainListenerBus()
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var s = constructed.poll()
    while (s != null) { out += s; s = constructed.poll() }
    out.distinct.toSeq
  }

  test("every registry query plans no unpartitioned Window, or is " +
    "allow-listed with a grain justification — and every cited " +
    "boundedCensus guard is PRESENT in that query's plans") {
    val unguarded = scala.collection.mutable.ArrayBuffer[String]()
    val uncachedCensus = scala.collection.mutable.ArrayBuffer[String]()
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        var planWs = Seq.empty[String]
        var guardSeen = false
        var badLeaves = Seq.empty[String]
        constructedUncachedGuard.clear()
        val execWs =
          try constructionWindows {
            val df = fn(spark, sf)
            planWs = emptySpecWindows(df)
            guardSeen = logicalHasGuard(df) || constructedGuard.get()
            badLeaves = badGuardLeafLogical(df)
          }
          catch { case e: Throwable => Seq(s"probe error: ${e.getMessage}") }
        guardSeen = guardSeen || constructedGuard.get()
        var s = constructedUncachedGuard.poll()
        while (s != null) { badLeaves :+= s; s = constructedUncachedGuard.poll() }
        val ws = planWs ++ execWs
        graft.util.Caches.releaseAll()
        spark.sharedState.cacheManager.clearCache()
        // verify the justification's claim: an allow-list entry citing
        // the runtime guard must plan it, or the citation is stale
        if (allowed.get(name).exists(_._2.contains("boundedCensus-guarded"))
          && !guardSeen)
          unguarded += name
        // round-14: a planned guard whose census count re-scans a file
        // source (instead of reading the cached census) is the
        // double-scan hazard — permanent form of the r12 manual audit
        if (badLeaves.nonEmpty)
          uncachedCensus += s"$name: ${badLeaves.distinct.mkString(", ")}"
        if (ws.isEmpty || allowed.contains(name)) Nil
        else Seq(s"$name: ${ws.mkString("; ")}")
    }
    assert(violations.isEmpty,
      "unpartitioned windows outside the allow-list:\n" +
        violations.mkString("\n"))
    assert(unguarded.isEmpty,
      "allow-list entries cite a boundedCensus guard their plans do " +
        s"not contain — the citation is stale: ${unguarded.mkString(", ")}")
    assert(uncachedCensus.isEmpty,
      "boundedCensus guards whose cardinality count re-scans a file " +
        "source — pass a CACHED census so the count is a cache read:\n" +
        uncachedCensus.mkString("\n"))
    // ENFORCE the grain typing: entity-derived censuses are never a
    // legal window input — rebuild them on PrefixSum.cumBefore
    val entityDerived = allowed.collect {
      case (name, (EntityDerived, why)) => s"$name ($why)"
    }
    assert(entityDerived.isEmpty,
      "entity-derived censuses may not ride unpartitioned windows — " +
        "rebuild on PrefixSum.cumBefore: " + entityDerived.mkString(", "))
    // the allow-list must not go stale: every entry still plans at
    // least one unpartitioned window (drop the entry when the shape
    // is rebuilt) and still names a real query
    val stale = allowed.keys.toSeq.sorted.filter { name =>
      !SparkEntry.queries.contains(name) || {
        var planWs = Seq.empty[String]
        val execWs = constructionWindows {
          planWs = emptySpecWindows(SparkEntry.queries(name)(spark, sf))
        }
        (planWs ++ execWs).isEmpty
      }
    }
    graft.util.Caches.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    assert(stale.isEmpty, s"stale allow-list entries: $stale")
  }

  test("guard detection red-test: removing the boundedCensus guard " +
    "from a census plan flips the detector (so the gate WOULD fail)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val census = (0L until 30L).map(v => v -> 1L).toDF("v", "c")
    val w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    val guarded = graft.util.Guards
      .boundedCensus(census, "Round11WindowGateSpec.red", cap = 1000L)
      .withColumn("cum", sum("c").over(w))
    val bare = census.withColumn("cum", sum("c").over(w))
    assert(logicalHasGuard(guarded),
      "detector must see the raise_error filter in a guarded plan")
    assert(!logicalHasGuard(bare),
      "detector must NOT see a guard in the guard-removed twin — " +
        "otherwise the presence check is vacuous")
  }

  test("uncached-census red-test: a boundedCensus guard over an " +
    "UNCACHED file-backed census flips the detector; the cached twin " +
    "is clean") {
    import org.apache.spark.sql.functions._
    val censusPlan = Tables.load(spark, sf, "nation")
      .groupBy("n_regionkey").agg(count(lit(1)).as("c"))
    val bare = graft.util.Guards
      .boundedCensus(censusPlan, "Round11WindowGateSpec.uncached",
        cap = 1000L)
    assert(badGuardLeafLogical(bare).nonEmpty,
      "detector must flag the guard count re-scanning the file source")
    val cached = graft.util.Caches.cached(censusPlan)
    val guarded = graft.util.Guards
      .boundedCensus(cached, "Round11WindowGateSpec.cached", cap = 1000L)
    assert(badGuardLeafLogical(guarded).isEmpty,
      "detector must pass a guard whose count reads the cached census")
    graft.util.Caches.releaseAll()
    spark.sharedState.cacheManager.clearCache()
  }
}
