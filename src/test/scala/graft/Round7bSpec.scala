package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Concentration, Experiment}

/** Round-6 part twenty-nine: DiD and source influence. */
class Round7bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("didReport: shared trend nets out, treatment effect remains") {
    import spark.implicits._
    val cut = ts("2024-01-16 00:00:00")
    // both arms drift +10 post; treatment adds +5 on top
    val ev = Seq(
      (0L, ts("2024-01-10 00:00:00"), 100.0),
      (0L, ts("2024-01-20 00:00:00"), 110.0),
      (1L, ts("2024-01-10 00:00:00"), 200.0),
      (1L, ts("2024-01-20 00:00:00"), 215.0))
      .toDF("user_id", "ts", "value")
    val r = Experiment.didReport(ev, pmod(col("user_id"), lit(2L)),
      col("ts") < lit(cut)).collect().head
    assert(r.getDouble(8) == 100000.0 && r.getDouble(9) == 110000.0)
    assert(r.getDouble(12) == 5000.0)    // DiD = 15 − 10 in milli
  }

  test("didReport: empty cell yields NULL readout, cores intact") {
    import spark.implicits._
    val cut = ts("2024-01-16 00:00:00")
    val ev = Seq(
      (0L, ts("2024-01-10 00:00:00"), 100.0),
      (1L, ts("2024-01-20 00:00:00"), 215.0))
      .toDF("user_id", "ts", "value")
    val r = Experiment.didReport(ev, pmod(col("user_id"), lit(2L)),
      col("ts") < lit(cut)).collect().head
    assert(r.getLong(0) == 1L && r.getLong(2) == 0L)
    assert(r.isNullAt(12))
  }

  test("influenceReport: the heavy outlier group owns the mean shift") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("a", 10.0), ("b", 10.0), ("b", 70.0))
      .toDF("source", "v")
    val r = Concentration.influenceReport(df, "source", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    // mean_all = 25; without b = 10; without a = 40
    assert(r("a").getDouble(3) == 25000.0)
    assert(r("a").getDouble(4) == 40000.0)
    assert(r("a").getDouble(5) == -15000.0)  // a pulls the mean DOWN
    assert(r("b").getDouble(5) == 15000.0)   // b pulls it UP
    // single-group corpus → NULLs
    val solo = Concentration.influenceReport(
      Seq(("x", 1.0)).toDF("source", "v"), "source", "v").collect().head
    assert(solo.isNullAt(4) && solo.isNullAt(5))
  }
}
