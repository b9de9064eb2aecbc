package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Evaluation

/** Round-9 part five specs: split-conformal calibration, hand-checked
  * ranks and the honest small-n (infinite-interval) branch.
  */
class Round9fSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(cal: Seq[Long], ev: Seq[Long],
      alphaPermille: Long = 100L) = {
    import spark.implicits._
    val df = (cal.map(s => (true, s)) ++ ev.map(s => (false, s)))
      .toDF("cal", "s")
      .select(col("cal"), col("s").as("y"), lit(0L).as("yhat"))
    val r = Evaluation.splitConformal(df, col("cal"), col("y"),
      col("yhat"), alphaPermille).collect()
    graft.util.Caches.releaseAll()
    assert(r.length === 1)
    r.head
  }

  test("splitConformal: k = ceil((n+1)(1-alpha)) picks the textbook " +
    "order statistic") {
    // n_cal = 9, alpha = 0.1 → k = ceil(10·0.9) = 9 → qhat = 9th
    // smallest = 9; eval {5, 9, 10} → covered 2/3
    val r = run(cal = (1L to 9L), ev = Seq(5L, 9L, 10L))
    assert(r.getLong(0) === 9L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 9L, r.toString)
    assert(r.getLong(3) === 2L)
    assert(r.getLong(4) === 2000000L / 3L, r.toString)
    assert(r.getLong(5) === 900000L)
  }

  test("splitConformal: duplicate scores resolve by cumulative count") {
    // cal = {2×5, 7×8}: n=9, k=9 → cum at s=5 is 2 (<9), at s=8 is 9 → 8
    val r = run(cal = Seq.fill(2)(5L) ++ Seq.fill(7)(8L),
      ev = Seq(8L, 9L))
    assert(r.getLong(2) === 8L, r.toString)
    assert(r.getLong(3) === 1L)
  }

  test("splitConformal: k > n_cal goes NULL, not a fake finite width") {
    // n_cal = 5, alpha = 0.1 → k = ceil(6·0.9) = 6 > 5
    val r = run(cal = (1L to 5L), ev = Seq(1L, 2L))
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), r.toString)
    assert(r.getLong(0) === 5L && r.getLong(1) === 2L)
  }

  test("splitConformal: tighter alpha lowers the pick") {
    // alpha = 0.5 → k = ceil(10·0.5) = 5 → qhat = 5
    val r = run(cal = (1L to 9L), ev = Seq(4L, 6L), alphaPermille = 500L)
    assert(r.getLong(2) === 5L, r.toString)
    assert(r.getLong(5) === 500000L)
  }

  test("mmrRerank: diversity beats a redundant near-copy at step 2") {
    import spark.implicits._
    // query 0 = (1,0,0); A(1) and B(2) are near-copies on one side of
    // the query, C(3) mirrors A on the OTHER side — all three equally
    // relevant at 4 dp, but sim(B,A) ≈ 1 while sim(C,A) ≈ 0.98.
    // Greedy: step 1 takes A (tie → lowest id); step 2 must take C —
    // B's redundancy penalty wipes out the tie at λ = 0.5. (2-D can't
    // express this: a candidate as close to A as to the query is
    // automatically as redundant as it is relevant.)
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.1f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.001f)),
      (3L, Seq(0.99f, -0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = graft.operators.Similarity
      .mmrRerank(embs, Seq(0L), k = 2, poolN = 3, lambdaPermille = 500L)
      .collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.length === 2, r.mkString(";"))
    assert(r(0)._1 === 1L && r(0)._2 === 1L, r.mkString(";"))
    // step-1 score is λ·rel with an empty selected set
    assert(r(0)._4 === 500L * r(0)._3, r.mkString(";"))
    assert(r(1)._1 === 2L && r(1)._2 === 3L,
      s"step 2 must pick the diverse candidate: ${r.mkString(";")}")
  }

  test("nelsonAalen: hand-computed hazard increments accumulate " +
    "exactly, censoring adds nothing") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    // 5 users entering day 0: u5 fails t=1, u1/u2 fail t=2, u3/u4
    // censored at the day-4 horizon
    val rows =
      (1 to 5).map(u => (u.toLong, "view", ts(0))) ++ Seq(
        (5L, "error", ts(1)),
        (1L, "error", ts(2)), (2L, "error", ts(2)),
        (3L, "view", ts(4)), (4L, "view", ts(4)))
    val ev = rows.toDF("user_id", "event_type", "ts")
    val r = graft.operators.Survival
      .nelsonAalen(ev, col("event_type") === "error")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    // t=1: 1/5 → 200000; t=2: 2/4 → +500000; t=4: censor only → flat
    assert(r.toSeq == Seq(
      (1L, 5L, 1L, 0L, 200000L),
      (2L, 4L, 2L, 0L, 700000L),
      (4L, 2L, 0L, 2L, 700000L)), r.mkString(";"))
    graft.util.Caches.releaseAll()
  }

  test("mmrRerank: lambda = 1000 degenerates to pure relevance order") {
    import spark.implicits._
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.999f, 0.01f)),
      (2L, Seq(0.998f, 0.02f)),
      (3L, Seq(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val r = graft.operators.Similarity
      .mmrRerank(embs, Seq(0L), k = 3, poolN = 3,
        lambdaPermille = 1000L)
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      r.mkString(";"))
  }
}
