package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Survival, TimeSeries}

/** Round-6 part twelve: Kaplan–Meier and integer EWMA. */
class Round6kSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "d", "event_type")
      .select(col("user_id"), to_timestamp(col("d")).as("ts"),
        col("event_type"), lit(1.0).as("value"))
  }

  // ---------------------------------------------------------------- km

  test("kaplanMeier: hand-computed curve with censoring reducing risk set") {
    // 4 users entering 01-01. u1 hits X on day 1 (t=1), u2 on day 3
    // (t=3); u3, u4 never hit → censored at horizon 01-04 (t=3).
    // t=1: n=4, d=1 → S = 3/4. t=3: n=3, d=1, c=2 → S = 3/4 · 2/3 = 1/2.
    val log = Seq(
      (1L, "2024-01-01", "view"), (1L, "2024-01-02", "err"),
      (2L, "2024-01-01", "view"), (2L, "2024-01-04", "err"),
      (3L, "2024-01-01", "view"), (3L, "2024-01-04", "view"),
      (4L, "2024-01-01", "view"))
    val r = Survival.kaplanMeier(ev(log), col("event_type") === "err")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(5))).toMap
    assert(r(1L) == (4L, 1L, 0L, 750000L))
    assert(r(3L) == (3L, 1L, 2L, 500000L))
  }

  test("kaplanMeier: censored users are NOT deaths — curve stays higher") {
    // same layout but u3/u4 treated naively as churns would halve S(1)
    val log = Seq(
      (1L, "2024-01-01", "err"),
      (2L, "2024-01-01", "view"), (3L, "2024-01-01", "view"),
      (4L, "2024-01-01", "view"), (9L, "2024-01-05", "view"))
    val r = Survival.kaplanMeier(ev(log), col("event_type") === "err")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(5))).toMap
    // t=0: 5 at risk, 1 event → S = 4/5; the 3 never-hit users censor
    // at t=4 (horizon − entry), the late entrant at t=0
    assert(r(0L)._1 == 5L && r(0L)._2 == 1L)
    assert(r(0L)._4 == 800000L)
    assert(r(4L) == (3L, 0L, 3L, 800000L)) // censoring leaves S alone
  }

  test("kaplanMeier: extinction level reports survival 0, NULL log-sum") {
    val log = Seq((1L, "2024-01-01", "err"), (2L, "2024-01-01", "view"),
      (2L, "2024-01-02", "err"))
    val r = Survival.kaplanMeier(ev(log), col("event_type") === "err")
      .collect()
    val last = r.last
    assert(last.getLong(1) == last.getLong(2)) // d == at-risk
    assert(last.isNullAt(4) && last.getLong(5) == 0L)
  }

  // -------------------------------------------------------------- ewma

  private def dv(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "d", "value")
      .select(col("event_type"), to_timestamp(col("d")).as("ts"), col("value"))
  }

  test("ewmaForecast: constant tracks exactly; hand-computed two-step") {
    val flat = TimeSeries.ewmaForecast(dv(Seq(
      ("a", "2024-01-01", 5.0), ("a", "2024-01-02", 5.0),
      ("a", "2024-01-03", 5.0))), "event_type").collect().head
    assert(flat.getLong(2) == 5000000L && flat.getLong(3) == 0L)

    // y = 4e6, 8e6: s₁=4e6, s₂=(3·4e6+8e6)/4=5e6; |8e6−4e6| → MAE 4e6
    val r = TimeSeries.ewmaForecast(dv(Seq(
      ("a", "2024-01-01", 4.0), ("a", "2024-01-02", 8.0))),
      "event_type").collect().head
    assert(r.getLong(2) == 5000000L)
    assert(r.getLong(3) == 4000000L)
  }

  test("ewmaForecast: single-day key yields NULL MAE; order-invariant") {
    val one = TimeSeries.ewmaForecast(dv(Seq(("a", "2024-01-01", 2.0))),
      "event_type").collect().head
    assert(one.isNullAt(3))
    val rows = Seq(("a", "2024-01-02", 7.0), ("a", "2024-01-01", 3.0),
      ("a", "2024-01-03", 1.0))
    val r1 = TimeSeries.ewmaForecast(dv(rows), "event_type").collect()
    val r2 = TimeSeries.ewmaForecast(dv(rows.reverse), "event_type").collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }
}
