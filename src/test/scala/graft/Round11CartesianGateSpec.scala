package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Registry-wide CARTESIAN gate, the crossJoin sibling of
  * Round11WindowGateSpec: a `CartesianProductExec` multiplies two
  * NON-broadcast relations — if both sides are data grain that is a
  * |A|·|B| blow-up no cluster survives, and nothing before this spec
  * inspected for it (round 10's audit verified every `crossJoin`
  * carries a `broadcast()` stat side BY HAND; this makes that audit
  * standing). The engine's intended shape — `crossJoin(broadcast(tiny
  * stat relation))` — plans as BroadcastNestedLoopJoin, which this
  * gate deliberately permits: with a broadcast side of O(1)–O(K) stat
  * rows it is a scan-stage enrichment, not a pair fan-out.
  *
  * Every query's physical plan (pre-execution initial plan, plus the
  * plans cached under InMemoryRelations, plus subqueries) must plan
  * ZERO CartesianProductExec nodes unless allow-listed with a grain
  * justification proving BOTH sides are bounded stat relations.
  */
class Round11CartesianGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** query -> justification for every cartesian it plans. */
  private val allowed: Map[String, String] = Map.empty

  import org.apache.spark.sql.execution.SparkPlan

  private def walkCartesians(p: SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    p.collectWithSubqueries {
      case c: CartesianProductExec =>
        Seq(s"CartesianProduct(${c.left.nodeName} x ${c.right.nodeName})")
      case a: AdaptiveSparkPlanExec => walkCartesians(a.executedPlan)
      case q: QueryStageExec => walkCartesians(q.plan)
      case s: InMemoryTableScanExec => walkCartesians(s.relation.cachedPlan)
    }.flatten
  }

  private def cartesians(df: DataFrame): Seq[String] =
    walkCartesians(df.queryExecution.executedPlan)

  /** Round-12 second eye (the window gate's listener transposed):
    * driver-finishing queries execute plans during CONSTRUCTION that
    * the returned DataFrame never shows — a cartesian there would ship
    * unseen. Records every CartesianProductExec of every plan executed
    * while the query function runs.
    */
  private val constructed =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val constructionListener = {
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        walkCartesians(qe.executedPlan)
          .foreach(c => constructed.add(s"$c [executed at construction]"))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    l
  }

  private def constructionCartesians(body: => Unit): Seq[String] = {
    constructionListener
    TestSpark.drainListenerBus()
    constructed.clear()
    body
    TestSpark.drainListenerBus()
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var s = constructed.poll()
    while (s != null) { out += s; s = constructed.poll() }
    out.distinct.toSeq
  }

  test("every registry query plans zero CartesianProduct nodes, or is " +
    "allow-listed with a both-sides-stat-grain justification") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        var planCs = Seq.empty[String]
        val execCs =
          try constructionCartesians { planCs = cartesians(fn(spark, sf)) }
          catch { case e: Throwable => Seq(s"probe error: ${e.getMessage}") }
        val cs = planCs ++ execCs
        graft.util.Caches.releaseAll()
        spark.sharedState.cacheManager.clearCache()
        if (cs.isEmpty || allowed.contains(name)) Nil
        else Seq(s"$name: ${cs.mkString("; ")}")
    }
    assert(violations.isEmpty,
      "cartesian products outside the allow-list:\n" +
        violations.mkString("\n"))
    val stale = allowed.keys.toSeq.sorted.filter { name =>
      !SparkEntry.queries.contains(name) ||
        cartesians(SparkEntry.queries(name)(spark, sf)).isEmpty
    }
    graft.util.Caches.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    assert(stale.isEmpty, s"stale allow-list entries: $stale")
  }
}
