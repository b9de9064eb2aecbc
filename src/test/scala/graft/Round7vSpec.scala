package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Round-7 part seventeen: searched mean-shift changepoint. */
class Round7vSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bestMeanBreak: finds a planted level shift at the right day") {
    import spark.implicits._
    // key 'shift': daily sums 10 for Jan 1-8, then 50 for Jan 9-16
    // key 'flat': constant 20 throughout -> zero variance reduction
    val ev = (1 to 16).flatMap { d =>
      val day = f"2024-01-$d%02d 08:00:00"
      Seq(("shift", ts(day), if (d <= 8) 10.0 else 50.0),
        ("flat", ts(day), 20.0))
    }.toDF("event_type", "ts", "value")
    val r = TimeSeries.bestMeanBreak(ev, "event_type").collect()
      .map(x => x.getString(0) -> x).toMap
    val sh = r("shift")
    assert(sh.getLong(1) == 16L)
    assert(sh.getDate(2).toString == "2024-01-08") // split after Jan 8
    assert(sh.getLong(3) == 8L)
    // the split explains ALL the variance of a clean step
    assert(sh.getDouble(6) == 1.0)
    val fl = r("flat")
    assert(fl.getDouble(4) == 0.0 && fl.isNullAt(6))
  }

  test("bestMeanBreak: short series emit nothing") {
    import spark.implicits._
    val ev = (1 to 3).map(d =>
      ("k", ts(f"2024-01-$d%02d 08:00:00"), d.toDouble))
      .toDF("event_type", "ts", "value")
    assert(TimeSeries.bestMeanBreak(ev, "event_type").collect().isEmpty)
  }
}
