package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Concentration, Experiment, Graph}

/** Round-6 part nineteen: diversity, assortativity, CUPED. */
class Round6rSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("diversityReport: balanced mix reads eff_cats = k, evenness 1") {
    import spark.implicits._
    val df = Seq(("s", "en"), ("s", "de"), ("s", "fr"),
      ("t", "en"), ("t", "en"), ("t", "en"), ("t", "de"))
      .toDF("source", "lang")
    val r = Concentration.diversityReport(df, "source", "lang")
      .collect().map(x => x.getString(0) -> x).toMap
    // s: 3 balanced categories → H = ln 3, eff = 3, evenness = 1
    assert(r("s").getLong(2) == 3L)
    assert(r("s").getDouble(4) == 3.0)
    assert(r("s").getDouble(5) == 1.0)
    // t: 3:1 split → H < ln 2, eff between 1 and 2
    assert(r("t").getDouble(4) > 1.0 && r("t").getDouble(4) < 2.0)
    // hand-check: cells round(0.75·ln(4/3)·1e9) + round(0.25·ln4·1e9)
    val h = math.rint(0.75 * math.log(4.0 / 3) * 1e9) +
      math.rint(0.25 * math.log(4.0) * 1e9)
    assert(r("t").getLong(3) == h.toLong)
  }

  test("diversityReport: single category → zero entropy, NULL evenness") {
    import spark.implicits._
    val df = Seq(("s", "en"), ("s", "en")).toDF("source", "lang")
    val r = Concentration.diversityReport(df, "source", "lang")
      .collect().head
    assert(r.getLong(3) == 0L && r.getDouble(4) == 1.0 && r.isNullAt(5))
  }

  test("assortativity: star graph is NULL only when degree-regular") {
    import spark.implicits._
    // path 1-2-3: degrees 1,2,1. directed pairs (dx,dy):
    // (1,2),(2,1),(2,1),(1,2) → r = −1 (perfectly disassortative)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("node_a", "node_b")
    val rp = Graph.assortativityReport(path).collect().head
    assert(rp.getLong(0) == 4L)
    assert(rp.getDouble(3) == -1.0)
    graft.util.Caches.releaseAll()
    // triangle: degree-regular → variance 0 → NULL
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("node_a", "node_b")
    val rt = Graph.assortativityReport(tri).collect().head
    assert(rt.isNullAt(3))
    graft.util.Caches.releaseAll()
  }

  test("cupedReport: perfectly predictive covariate flattens the arms") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cut = ts("2024-01-16 00:00:00")
    // y = 2x per user: after adjustment every user has identical
    // residual, so both arms' adjusted means collapse to the same value
    val ev = Seq(
      (1L, ts("2024-01-10 00:00:00"), 10.0), // user 1 pre
      (1L, ts("2024-01-20 00:00:00"), 20.0), // user 1 post
      (2L, ts("2024-01-10 00:00:00"), 30.0),
      (2L, ts("2024-01-20 00:00:00"), 60.0),
      (3L, ts("2024-01-10 00:00:00"), 50.0),
      (3L, ts("2024-01-20 00:00:00"), 100.0),
      (4L, ts("2024-01-10 00:00:00"), 70.0),
      (4L, ts("2024-01-20 00:00:00"), 140.0))
      .toDF("user_id", "ts", "value")
    val r = Experiment.cupedReport(ev, col("ts") < lit(cut),
      pmod(col("u"), lit(2L))).collect()
    assert(r.length == 2)
    assert(r(0).getDouble(6) == 2.0)     // theta = cov/var = 2
    // raw means differ (odd users 20,100 vs even 60,140)…
    assert(r(0).getDouble(4) != r(1).getDouble(4))
    // …adjusted means agree exactly
    assert(r(0).getDouble(5) == r(1).getDouble(5))
  }

  test("cupedReport: constant covariate degrades to theta 0") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cut = ts("2024-01-16 00:00:00")
    val ev = Seq(
      (1L, ts("2024-01-10 00:00:00"), 5.0),
      (1L, ts("2024-01-20 00:00:00"), 7.0),
      (2L, ts("2024-01-10 00:00:00"), 5.0),
      (2L, ts("2024-01-20 00:00:00"), 9.0))
      .toDF("user_id", "ts", "value")
    val r = Experiment.cupedReport(ev, col("ts") < lit(cut),
      pmod(col("u"), lit(2L))).collect()
    assert(r.forall(_.getDouble(6) == 0.0))
    // adjusted ≡ raw when theta is 0
    assert(r.forall(x => x.getDouble(4) == x.getDouble(5)))
  }
}
