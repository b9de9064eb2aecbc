package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Graph, ProfileDrift}

/** Round-6 part twenty-four: personalized PageRank and the PSI suite. */
class Round6wSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("personalized PR: restart mass lands only on seeds") {
    import spark.implicits._
    // path 1-2-3, seed {1}: restart = 150000·3 div 1 = 450000 on node 1
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("node_a", "node_b")
    val seeds = Seq((1L, 1L)).toDF("node", "w")
    val r = Graph.pageRankPersonalizedMicro(edges, 1, seeds)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(2) == 450000L)
    assert(r(2L).getLong(2) == 0L && r(3L).getLong(2) == 0L)
    // round 1 from uniform 10⁶ ranks:
    // in(1) = 10⁶ div 2 = 500000 → 450000 + 425000 = 875000
    // in(2) = 10⁶ + 10⁶ = 2·10⁶ → 0 + 1700000
    // in(3) = 500000 → 0 + 425000
    assert(r(1L).getLong(3) == 875000L)
    assert(r(2L).getLong(3) == 1700000L)
    assert(r(3L).getLong(3) == 425000L)
    graft.util.Caches.releaseAll()
  }

  test("personalized PR: seed proximity orders the steady ranks") {
    import spark.implicits._
    // star: hub 1 with leaves 2..5; seed {2} — after some rounds the
    // seed itself outranks the other leaves
    val edges = (2L to 5L).map(l => (1L, l)).toDF("node_a", "node_b")
    val seeds = Seq((2L, 1L)).toDF("node", "w")
    val r = Graph.pageRankPersonalizedMicro(edges, 4, seeds)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(2L) > r(3L) && r(3L) == r(4L) && r(4L) == r(5L))
    graft.util.Caches.releaseAll()
  }

  test("psiSuite ≡ per-column psiReport") {
    import spark.implicits._
    val ref = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 35.0), (4.0, 40.0))
      .toDF("a", "b")
    val cur = Seq((1.0, 38.0), (1.5, 39.0), (4.0, 41.0)).toDF("a", "b")
    val suite = ProfileDrift.psiSuite(ref, cur, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    for (c <- Seq("a", "b")) {
      val single = ProfileDrift.psiReport(
        ref.select(lit(c).as("g"), col(c).as("v")),
        cur.select(lit(c).as("g"), col(c).as("v")), "g", "v")
        .collect().head.getDouble(3)
      assert(suite(c) == single, s"feature $c diverged")
    }
    // b's mass concentrated at the top bins → larger PSI than a
    assert(suite("b") > suite("a"))
  }
}
