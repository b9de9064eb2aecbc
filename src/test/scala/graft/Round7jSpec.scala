package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Privacy, Survival}

/** Round-7 part five: uplift bins, t-closeness, log-rank. */
class Round7jSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("logRank: identical arm lifetimes score exactly zero") {
    import spark.implicits._
    // same event days in both arms -> O − E = 0 at every time
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "start", 0.0),
      (1L, ts("2024-01-03 00:00:00"), "churn", 1.0),
      (2L, ts("2024-01-01 00:00:00"), "start", 0.0),
      (2L, ts("2024-01-03 00:00:00"), "churn", 1.0),
      (3L, ts("2024-01-01 00:00:00"), "start", 0.0),
      (3L, ts("2024-01-05 00:00:00"), "churn", 1.0),
      (4L, ts("2024-01-01 00:00:00"), "start", 0.0),
      (4L, ts("2024-01-05 00:00:00"), "churn", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = Survival.logRank(ev, col("event_type") === "churn",
      col("user_id") % 2 === 0).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.0)
  }

  test("logRank: a strongly separated arm clears the 5% critical value") {
    import spark.implicits._
    // arm A (even users) churns on day 2, arm B never churns
    val ev = (0L until 40L).flatMap { u =>
      val base = Seq((u, ts("2024-01-01 00:00:00"), "start", 0.0),
        (u, ts("2024-01-10 00:00:00"), "ping", 0.0))
      if (u % 2 == 0) base :+ ((u, ts("2024-01-02 00:00:00"), "churn", 1.0))
      else base
    }.toDF("user_id", "ts", "event_type", "value")
    val r = Survival.logRank(ev, col("event_type") === "churn",
      col("user_id") % 2 === 0).collect().head
    assert(r.getLong(2) == 20L && r.getLong(3) == 0L)
    assert(r.getDouble(4) > 3.841, s"chi2 ${r.getDouble(4)} not significant")
  }

  test("upliftByDecile: treatment effect concentrated in high scores") {
    import spark.implicits._
    // scores 0..99; only score >= 80 treated units convert, plus a
    // 0-rate control everywhere
    val units = (0 until 100).flatMap(s => Seq(
      (s.toLong, 0, false),
      (s.toLong, 1, s >= 80)))
      .toDF("score", "arm", "success")
    val r = Experiment.upliftByDecile(units, "score").collect()
    assert(r.length == 10)
    // rows come highest bin first; top two bins (scores 80..99) carry
    // all the uplift
    assert(r.head.getLong(0) == 9L)
    assert(r.head.getLong(5) == 1000000L) // bin-9 uplift = 100% in ppm
    assert(r.last.getLong(5) == 0L)
    // cumulative uplift declines as low-score bins dilute the slice
    val cum = r.map(_.getLong(7))
    assert(cum.head == 1000000L && cum.last == 200000L)
    assert(cum.zip(cum.tail).forall { case (a, b) => a >= b })
  }

  test("tClosenessReport: hand-computed total-variation milli") {
    import spark.implicits._
    // global x:3 y:1; class A=[x,x] and B=[x,y] both sit at TV=0.25
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"))
      .toDF("q", "v")
    val r = Privacy.tClosenessReport(df, Seq("q"), "v", 200L).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getBoolean(3))).toMap
    assert(r("A") == (2L, 250L, true))
    assert(r("B") == (2L, 250L, true))
    // a class mirroring the global mix scores zero
    val df2 = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("q", "v")
    val r2 = Privacy.tClosenessReport(df2, Seq("q"), "v", 200L).collect()
    assert(r2.forall(x => x.getLong(2) == 0L && !x.getBoolean(3)))
  }
}
