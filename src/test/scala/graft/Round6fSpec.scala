package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Correlate, TimeSeries}
import graft.streaming.StreamingOps

/** Round-6 part seven: ANOVA F, Theil–Sen, seasonality, and the CDC
  * latest-wins streaming twin.
  */
class Round6fSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "d", "value")
      .select(col("event_type"), to_timestamp(col("d")).as("ts"), col("value"))
  }

  // ---------------------------------------------------------------- anova

  test("anovaF: hand-computed two-group separation, F = 13.5") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Correlate.anovaF(df, "g", "v").collect()
    assert(r.length == 2)
    val a = r.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 3L)             // n_g
    assert(a.getLong(2) == 6000L)          // s_milli
    assert(a.getLong(3) == 2000000L)       // ssw contribution
    assert(a.getLong(4) == 6750000L)       // ssb contribution
    assert(a.getLong(5) == 4000000L)       // ssw_total
    assert(a.getLong(6) == 13500000L)      // ssb_total
    assert(a.getLong(7) == 1L && a.getLong(8) == 4L)
    assert(a.getDouble(9) == 13.5)
  }

  test("anovaF: identical group distributions → between-variance 0, F = 0") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("g", "v")
    val r = Correlate.anovaF(df, "g", "v").collect()
    assert(r.forall(_.getLong(4) == 0L))
    assert(r.forall(_.getDouble(9) == 0.0))
  }

  // ------------------------------------------------------------ theil-sen

  test("theilSen: exact slope on a linear series; robust to one outlier") {
    val lin = TimeSeries.theilSen(ev(Seq(
      ("a", "2024-01-01", 5.0), ("a", "2024-01-02", 7.0),
      ("a", "2024-01-03", 9.0), ("a", "2024-01-04", 11.0))),
      "event_type").collect().head
    assert(lin.getLong(1) == 6L)                       // C(4,2) pairs
    assert(lin.getDouble(3) == 2000000.0)              // 2 units/day micro

    // one wild day: OLS would swing; the pair-slope median holds at 2
    val rob = TimeSeries.theilSen(ev(Seq(
      ("a", "2024-01-01", 5.0), ("a", "2024-01-02", 7.0),
      ("a", "2024-01-03", 9.0), ("a", "2024-01-04", 11.0),
      ("a", "2024-01-05", 500.0))), "event_type").collect().head
    assert(rob.getDouble(3) == 2000000.0)
    graft.util.Caches.releaseAll()
  }

  // ---------------------------------------------------------- seasonality

  test("seasonalityReport: flat series → every weekday index is 10⁶ ppm") {
    val rows = (1 to 14).map(d => ("a", f"2024-01-$d%02d", 3.0))
    val r = TimeSeries.seasonalityReport(ev(rows), "event_type").collect()
    assert(r.length == 7)
    assert(r.forall(_.getLong(6) == 1000000L))
    assert(r.forall(_.getLong(2) == 2L)) // two of each weekday
  }

  test("seasonalityReport: doubled Sundays — index splits 1.75x vs 0.875x") {
    // 2024-01-07 and -14 are Sundays. value 6 there, 3 elsewhere:
    // mean_sun/mean_all = 6 / (48/14) = 1.75
    val rows = (1 to 14).map { d =>
      val v = if (d == 7 || d == 14) 6.0 else 3.0
      ("a", f"2024-01-$d%02d", v)
    }
    val r = TimeSeries.seasonalityReport(ev(rows), "event_type").collect()
      .map(x => x.getInt(1) -> x.getLong(6)).toMap
    assert(r(1) == 1750000L)               // Sunday (Spark dow 1)
    assert(r(2) == 875000L)                // Monday
  }

  // ------------------------------------------------------------- cdc twin

  test("latestChangeStream: last emitted per key ≡ batch latest-wins") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingOps.CdcChange
    val input = MemoryStream[CdcChange]
    val out = StreamingOps.latestChangeStream(input.toDS().toDF())
    val name = "cdc_stream_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(CdcChange(1, 10, "U", "v1"), CdcChange(2, 5, "U", "w1"))
      q.processAllAvailable()
      // batch 2: key 1 advances; key 2 gets a LATE lower-seq change
      input.addData(CdcChange(1, 20, "D", "v2"), CdcChange(2, 3, "U", "stale"))
      q.processAllAvailable()
      // batch 3: key 2 advances twice within one batch (only max emits
      // after the fold processes in seq order — both emit, latest last)
      input.addData(CdcChange(2, 8, "U", "w2"), CdcChange(2, 9, "D", "w3"))
      q.processAllAvailable()
      val emitted = spark.table(name).as[CdcChange].collect()
      // the stale change must never have been emitted
      assert(!emitted.exists(c => c.key == 2 && c.payload == "stale"))
      val lastPerKey = emitted.groupBy(_.key).view
        .mapValues(_.maxBy(_.seq)).toMap
      assert(lastPerKey(1L) == CdcChange(1, 20, "D", "v2"))
      assert(lastPerKey(2L) == CdcChange(2, 9, "D", "w3"))
    } finally q.stop()
  }
}
