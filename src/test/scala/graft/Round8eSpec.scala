package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Experiment, Sampling, Transitions}

/** Round-8 part six specs: sequential triples, IPW, Neyman
  * allocation, average precision.
  */
class Round8eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sequentialTriples: subsequence witness, gaps allowed") {
    import spark.implicits._
    // user 1: a x b y c  (a..b..c with gaps present)
    // user 2: c b a      (reversed -> absent)
    // user 3: a c b      (a..c..b present; a..b..c absent: no c after b)
    val rows = Seq(
      (1L, "a"), (1L, "x"), (1L, "b"), (1L, "y"), (1L, "c"),
      (2L, "c"), (2L, "b"), (2L, "a"),
      (3L, "a"), (3L, "c"), (3L, "b"))
    val ev = rows.zipWithIndex.map { case ((u, s), i) =>
      (u, ts(s"2024-01-01 10:${"%02d".format(i)}:00"), i.toLong, s)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val r = Transitions.sequentialTriples(ev, 100).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2)) ->
        x.getLong(3)).toMap
    assert(r(("a", "b", "c")) == 1L, s"$r")
    assert(r(("a", "c", "b")) == 1L, s"$r")
    assert(!r.contains(("c", "b", "x")) || r(("c", "b", "x")) == 1L)
    assert(r(("c", "b", "a")) == 1L, s"user 2's own order: $r")
    graft.util.Caches.releaseAll()
  }

  test("ipwAte: reweighting removes a planted confound") {
    import spark.implicits._
    // bin A: 80% treated, outcome 10 regardless of arm
    // bin B: 20% treated, outcome 0 regardless of arm
    // true ATE = 0, but naive contrast is confounded upward (treated
    // units over-represent the high-outcome bin)
    val rows =
      (1 to 80).map(i => ("A", true, 10.0)) ++
      (1 to 20).map(i => ("A", false, 10.0)) ++
      (1 to 20).map(i => ("B", true, 0.0)) ++
      (1 to 80).map(i => ("B", false, 0.0))
    val df = rows.toDF("bin", "t", "y")
    val r = Experiment.ipwAte(df, col("t"), col("y"), col("bin"))
      .collect()(0)
    assert(r.getLong(3) == 0L, s"IPW recovers the null effect: $r")
    assert(r.getLong(4) > 5000000L, s"naive is confounded upward: $r")
    assert(r.getLong(0) == 200L && r.getLong(1) == 200L)
    graft.util.Caches.releaseAll()
  }

  test("ipwAte: degenerate bins are excluded from n_used") {
    import spark.implicits._
    val rows = (1 to 10).map(_ => ("all_t", true, 1.0)) ++
      (1 to 10).map(i => ("mixed", i % 2 == 0, 1.0))
    val r = Experiment.ipwAte(rows.toDF("bin", "t", "y"),
      col("t"), col("y"), col("bin")).collect()(0)
    assert(r.getLong(0) == 20L && r.getLong(1) == 10L,
      s"the all-treated bin must drop: $r")
    graft.util.Caches.releaseAll()
  }

  test("neymanAllocation: volatile strata win, budget sums exactly") {
    import spark.implicits._
    // stratum a: 100 rows constant (sigma 0); b: 100 rows volatile;
    // c: 50 rows equally volatile -> alloc ratio b:c = 2:1, a = 0
    val rows = (1 to 100).map(i => ("a", 5.0)) ++
      (1 to 100).map(i => ("b", if (i % 2 == 0) 0.0 else 10.0)) ++
      (1 to 50).map(i => ("c", if (i % 2 == 0) 0.0 else 10.0))
    val r = Sampling.neymanAllocation(rows.toDF("g", "v"), "g", "v", 999L)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r("a") == 0L, s"constant stratum gets nothing: $r")
    assert(r.values.sum == 999L, s"largest-remainder hits the budget: $r")
    assert(math.abs(r("b") - 2L * r("c")) <= 1L, s"2:1 by N·sigma: $r")
    graft.util.Caches.releaseAll()
  }

  test("averagePrecision: perfect ranking = 1e6, inverted is low") {
    import spark.implicits._
    val perfect = (1 to 100).map(i => (i.toLong, i > 90))
      .toDF("score", "y")
    val p = Evaluation.averagePrecision(perfect, "score", col("y"))
      .collect()(0)
    assert(p.getLong(3) == 1000000L, s"perfect ranking: $p")
    val inverted = (1 to 100).map(i => (i.toLong, i <= 10))
      .toDF("score", "y")
    val w = Evaluation.averagePrecision(inverted, "score", col("y"))
      .collect()(0)
    assert(w.getLong(3) < 200000L, s"inverted ranking scores low: $w")
    graft.util.Caches.releaseAll()
  }
}
