package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Round-6 part twenty-two: Holt linear-trend forecaster. */
class Round6uSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def daily(key: String, vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (key, ts(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }

  test("holtForecast: hand-computed level/trend on a rising series") {
    import spark.implicits._
    // y (micro) = 4e6, 8e6, 12e6:
    // t1: l=4e6 b=0
    // t2: p=4e6; l=⌊(12e6+8e6)/4⌋=5e6; b=⌊(0+1e6)/4⌋=250000; ae=4e6
    // t3: p=5.25e6; l=⌊(15.75e6+12e6)/4⌋=6937500;
    //     b=⌊(750000+1937500)/4⌋=671875; ae=4e6+6.75e6=10.75e6
    val ev = daily("k", Seq(4.0, 8.0, 12.0))
      .toDF("event_type", "ts", "value")
    val r = TimeSeries.holtForecast(ev, "event_type").collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 6937500L)       // level
    assert(r.getLong(3) == 671875L)        // trend
    assert(r.getLong(4) == 6937500L + 671875L)
    assert(r.getLong(5) == 10750000L / 2)  // mae
  }

  test("holtForecast: falling series carries a NEGATIVE truncated trend") {
    import spark.implicits._
    // y = 12e6, 4e6: t2: p=12e6; l=(36e6+4e6) div 4=10e6;
    // b=(0 + (10e6−12e6)) div 4 = −500000
    val ev = daily("k", Seq(12.0, 4.0)).toDF("event_type", "ts", "value")
    val r = TimeSeries.holtForecast(ev, "event_type").collect().head
    assert(r.getLong(2) == 10000000L && r.getLong(3) == -500000L)
    // TRUNCATION semantics on a negative non-multiple (both engines
    // truncate toward zero — Spark div ≡ DuckDB //):
    // l = 40000004 div 4 = 10000001, dl = −1999999 →
    // b = −1999999 div 4 = −499999 (floor would give −500000)
    val ev2 = daily("k", Seq(12.0, 4.000004)).toDF("event_type", "ts", "value")
    val r2 = TimeSeries.holtForecast(ev2, "event_type").collect().head
    assert(r2.getLong(2) == 10000001L && r2.getLong(3) == -499999L)
  }

  test("holtForecast: constant series tracks exactly after step one") {
    import spark.implicits._
    val ev = daily("k", Seq(5.0, 5.0, 5.0, 5.0))
      .toDF("event_type", "ts", "value")
    val r = TimeSeries.holtForecast(ev, "event_type").collect().head
    assert(r.getLong(2) == 5000000L && r.getLong(3) == 0L)
    assert(r.getLong(5) == 0L)             // zero one-step error
    // single day → NULL mae
    val one = daily("k", Seq(5.0)).toDF("event_type", "ts", "value")
    assert(TimeSeries.holtForecast(one, "event_type")
      .collect().head.isNullAt(5))
  }
}
