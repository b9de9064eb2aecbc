package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, ProfileDrift}

/** Round-6 part twenty-three: KS suite and covariate balance. */
class Round6vSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ksSuite: per-feature results ≡ per-column ksReport") {
    import spark.implicits._
    val ref = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("a", "b")
    val cur = Seq((1.0, 40.0), (2.0, 50.0), (4.0, 60.0)).toDF("a", "b")
    val suite = ProfileDrift.ksSuite(ref, cur, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getDouble(5))).toMap
    for (c <- Seq("a", "b")) {
      val single = ProfileDrift.ksReport(
        ref.select(lit(c).as("g"), col(c).as("v")),
        cur.select(lit(c).as("g"), col(c).as("v")), "g", "v")
        .collect().head
      assert(suite(c) == (single.getLong(3), single.getDouble(5)),
        s"feature $c diverged from the single-column report")
    }
    // disjoint column b → KS = 1; overlapping a → KS = 1/3
    assert(suite("b")._2 == 1.0)
    assert(suite("a")._2 == 0.333333)
  }

  test("covariateBalance: shifted arm flags imbalance, zero-fill binds") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // feature 'x': arm1 users spend 10× arm0 → imbalanced
    // feature 'y': identical spend both arms → balanced (smd 0)
    // user 4 never logs 'y' → zero-filled, not dropped
    val ev = Seq(
      (0L, "x", 1.0), (2L, "x", 2.0),   // arm 0
      (1L, "x", 15.0), (3L, "x", 25.0), // arm 1
      (0L, "y", 5.0), (2L, "y", 7.0),
      (1L, "y", 5.0), (3L, "y", 7.0),
      (4L, "x", 2.0))                   // arm 0, no 'y'
      .map { case (u, f, v) => (u, f, v, ts("2024-01-01 00:00:00")) }
      .toDF("user_id", "event_type", "value", "ts")
    val r = Experiment.covariateBalance(ev, pmod(col("u"), lit(2L)))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("x").getLong(1) == 3L && r("x").getLong(2) == 2L)
    assert(!r("x").getBoolean(6))            // imbalanced
    assert(r("y").getLong(1) == 3L)          // user 4 zero-filled into ctrl
    // y means: ctrl (5000+7000+0)/3 = 4000, treat 6000 → some smd, but
    // the ZERO fill is what moved ctrl — assert it did
    assert(r("y").getDouble(3) == 4000.0)
    assert(r("y").getDouble(4) == 6000.0)
  }

  test("covariateBalance: equal arms read smd 0 and balanced") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (0L, "x", 1.0), (2L, "x", 9.0),
      (1L, "x", 1.0), (3L, "x", 9.0))
      .map { case (u, f, v) => (u, f, v, ts("2024-01-01 00:00:00")) }
      .toDF("user_id", "event_type", "value", "ts")
    val r = Experiment.covariateBalance(ev, pmod(col("u"), lit(2L)))
      .collect().head
    assert(r.getDouble(5) == 0.0 && r.getBoolean(6))
  }
}
