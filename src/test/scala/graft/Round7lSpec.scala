package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Evaluation, SkewReport, TimeSeries}
import graft.streaming.StreamingOps

/** Round-7 part seven: Chow break, conformal intervals, and the
  * streaming join-size twin.
  */
class Round7lSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("chowTest: a slope kink at the breakpoint drives a large F") {
    import spark.implicits._
    // key 'kink': slope +1 for days 0..9, slope +5 after; key 'line':
    // one straight line throughout -> F ~ 0
    val rows = (0 until 20).flatMap { d =>
      val day = f"2024-01-${d + 1}%02d 12:00:00"
      val kinkV = if (d < 10) d.toDouble else 10.0 + 5.0 * (d - 10)
      Seq(("kink", ts(day), kinkV), ("line", ts(day), 2.0 * d))
    }.toDF("event_type", "ts", "value")
    val r = TimeSeries.chowTest(rows, "event_type", "2024-01-11")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("kink").getLong(1) == 10L && r("kink").getLong(2) == 10L)
    // two clean lines fit the segments exactly -> RSS1+RSS2 = 0 -> NULL
    // guard would fire; add jitter-free check on 'line' instead
    assert(r("line").getDouble(3) == r("line").getDouble(4),
      "straight line: equal segment slopes")
    val fLine = if (r("line").isNullAt(5)) 0.0 else r("line").getDouble(5)
    assert(fLine < 1.0, s"no-break F should be ~0, got $fLine")
  }

  test("chowTest: noisy kink clears the 1% critical value, noisy line does not") {
    import spark.implicits._
    // deterministic jitter so segment RSS > 0
    def jit(d: Int) = (d * 37 % 7 - 3) * 0.05
    val rows = (0 until 24).flatMap { d =>
      val day = f"2024-01-${d + 1}%02d 12:00:00"
      val kinkV = (if (d < 12) d.toDouble else 12.0 + 6.0 * (d - 12)) + jit(d)
      Seq(("kink", ts(day), kinkV), ("line", ts(day), 1.5 * d + jit(d)))
    }.toDF("event_type", "ts", "value")
    val r = TimeSeries.chowTest(rows, "event_type", "2024-01-13")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("kink").getDouble(5) > 5.85, // F(2, 20) at 1%
      s"kink F = ${r("kink").getDouble(5)}")
    assert(r("line").getDouble(5) < 5.85,
      s"line F = ${r("line").getDouble(5)}")
  }

  test("conformalReport: empirical coverage meets the 1-alpha guarantee") {
    import spark.implicits._
    // deterministic spread of values around a group mean
    val rows = (0L until 2000L).map { i =>
      ("g", i, 100.0 + (i * 13 % 41).toDouble - 20.0)
    }.toDF("event_type", "event_id", "value")
    val r = Evaluation.conformalReport(rows, "event_type", "value",
      "event_id", 100L).collect().head
    val nCal = r.getLong(1); val nTest = r.getLong(2)
    assert(nCal + nTest == 2000L && nCal > 800 && nTest > 800)
    // coverage >= 1 - alpha (minus small-sample slack)
    assert(r.getLong(6) >= 880000L,
      s"coverage ${r.getLong(6)} ppm below the guarantee")
    // qhat is a real calibration residual
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 21000000L)
  }

  test("streaming join-size twin ≡ batch forecast on a drained stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, dir, "events")
    val orders = Tables.load(spark, dir, "orders")
    val all = ev.select(col("ts"), col("user_id"))
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val census = StreamingOps.keyCensusStream(
      input.toDS().toDF("ts", "user_id"), "3650 days", "0 seconds")
    val name = "js_census_" + System.nanoTime()
    val q = census.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(all)
      q.processAllAvailable()
      input.addData((ts("2044-01-01 00:00:00"), -999L)) // flush window
      q.processAllAvailable()
      val firstWindow = spark.table(name)
        .groupBy().agg(min("window_start")).collect()(0).getTimestamp(0)
      val got = SkewReport.joinSizeFromCounts(
          spark.table(name).filter(col("window_start") === lit(firstWindow)),
          orders, "o_custkey")
        .drop("window_start", "window_end").collect().map(_.toSeq).toSeq
      val want = SkewReport.joinSizeReport(ev, orders,
        "user_id", "o_custkey").collect().map(_.toSeq).toSeq
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }
}
