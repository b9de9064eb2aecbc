package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Attribution, Graph, Transitions}

/** Round-8 part five specs: followed-by census, Shapley attribution,
  * Adamic–Adar link prediction.
  */
class Round8dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("followedByCensus: gap-tolerant ordering, not just adjacency") {
    import spark.implicits._
    // user 1: a .. x .. b (a before b WITH a gap — transitionMatrix
    // would never pair them); user 2: b then a (not a-then-b)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "x"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "b"),
      (2L, ts("2024-01-01 11:00:00"), 4L, "b"),
      (2L, ts("2024-01-01 11:01:00"), 5L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Transitions.followedByCensus(ev).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    // a→b: only user 1 (user 2's a comes after its b)
    assert(r(("a", "b")) == (2L, 2L, 1L, 500000L), s"$r")
    // b→a: only user 2
    assert(r(("b", "a")) == (2L, 2L, 1L, 500000L), s"$r")
    // a→x: user 1 only; x appears once
    assert(r(("a", "x"))._3 == 1L)
    graft.util.Caches.releaseAll()
  }

  test("shapleyAttribution: efficiency and a hand-computed split") {
    import spark.implicits._
    // 4 users: {a}→conv, {a}→no, {b}→no, {a,b}→conv
    // v({a}) = 500000, v({b}) = 0, v({a,b}) = 1000000, v(∅) = 0
    // φ_a = (1/2)(v(a)−v(∅)) + (1/2)(v(ab)−v(b)) = 250000 + 500000
    // φ_b = (1/2)(v(b)−v(∅)) + (1/2)(v(ab)−v(a)) = 0 + 250000
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "purchase"),
      (2L, ts("2024-01-02 10:00:00"), 3L, "a"),
      (3L, ts("2024-01-03 10:00:00"), 4L, "b"),
      (4L, ts("2024-01-04 10:00:00"), 5L, "a"),
      (4L, ts("2024-01-04 10:01:00"), 6L, "b"),
      (4L, ts("2024-01-04 10:02:00"), 7L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Attribution.shapleyAttribution(ev, "purchase").collect()
      .map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r("a") == 750000L, s"$r")
    assert(r("b") == 250000L, s"$r")
    // efficiency: Σφ = v(full) − v(∅) = 1000000 − 0
    assert(r.values.sum == 1000000L, s"$r")
    graft.util.Caches.releaseAll()
  }

  test("adamicAdarTopK: rare shared neighbor outranks a hub") {
    import spark.implicits._
    // z1 (degree 2) connects 1-2; hub z2 (degree 4) connects 3-4;
    // both candidate pairs have one common neighbor, but 1-2 scores
    // 1/ln(2) > 3-4's 1/ln(4)
    val edges = Seq((100L, 1L), (100L, 2L), (200L, 3L), (200L, 4L),
      (200L, 5L), (200L, 6L)).toDF("node_a", "node_b")
    val r = Graph.adamicAdarTopK(edges, 10).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(3)).toMap
    assert(r((1L, 2L)) > r((3L, 4L)), s"$r")
    assert(r((1L, 2L)) == math.round(1e6 / math.log(2.0)), s"$r")
    // existing edges never appear as candidates
    assert(!r.contains((100L, 1L)) && !r.contains((1L, 100L)))
    graft.util.Caches.releaseAll()
  }

  test("adamicAdarTopK: the wedge cap drops hub centers") {
    import spark.implicits._
    val edges = Seq((100L, 1L), (100L, 2L), (200L, 3L), (200L, 4L),
      (200L, 5L), (200L, 6L)).toDF("node_a", "node_b")
    val r = Graph.adamicAdarTopK(edges, 10, Some(3L)).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    // hub z2 (degree 4 > cap 3) contributes nothing: only 1-2 remains
    assert(r.contains((1L, 2L)) && !r.exists(p => p._1 >= 3L && p._1 <= 6L),
      s"$r")
    graft.util.Caches.releaseAll()
  }
}
