package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{ProfileDrift, TimeSeries}

/** Round-6 part twenty-one: Q–Q drift and Fano overdispersion. */
class Round6tSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df1(vs: Seq[Double]) = {
    import spark.implicits._
    vs.map(("g", _)).toDF("k", "value")
  }

  test("qqReport: pure location shift reads the shift at every decile") {
    val ref = df1((1 to 100).map(_.toDouble))
    val cur = df1((1 to 100).map(_ + 7.0))
    val r = ProfileDrift.qqReport(ref, cur, "k", "value").collect()
    assert(r.length == 9)
    assert(r.forall(_.getLong(6) == 7000000L))   // +7 at every decile
    // decile picks are real data values: q5 of 1..100 is 50
    val q5 = r.find(_.getInt(1) == 5).get
    assert(q5.getLong(4) == 50000000L && q5.getLong(5) == 57000000L)
  }

  test("qqReport: identical sides read zero shift") {
    val ref = df1(Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    val r = ProfileDrift.qqReport(ref, ref, "k", "value").collect()
    assert(r.forall(_.getLong(6) == 0L))
    // ⌈q·5/10⌉ picks: q1→1st=1, q5→3rd=3, q9→5th=5
    val byQ = r.map(x => x.getInt(1) -> x.getLong(4)).toMap
    assert(byQ(1) == 1000000L && byQ(5) == 3000000L && byQ(9) == 5000000L)
  }

  test("fanoReport: constant days ⇒ 0, bursty ⇒ overdispersed") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 'flat': 2 events/day × 3 days → var 0, fano 0
    // 'burst': 1, 1, 7 events → var_num = 3·51−81 = 72;
    //   fano_ppm = 72e6 div (2·9) = 4e6 → overdispersed
    val ev =
      (1 to 2).flatMap(i => Seq(
        ("flat", ts("2024-01-01 00:00:00")), ("flat", ts("2024-01-02 00:00:00")),
        ("flat", ts("2024-01-03 00:00:00")))) ++
      Seq(("burst", ts("2024-01-01 00:00:00")), ("burst", ts("2024-01-02 00:00:00"))) ++
      (1 to 7).map(_ => ("burst", ts("2024-01-03 00:00:00")))
    val r = TimeSeries.fanoReport(ev.toDF("event_type", "ts"), "event_type")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("flat").getLong(4) == 0L && !r("flat").getBoolean(5))
    assert(r("burst").getLong(3) == 72L)
    assert(r("burst").getLong(4) == 4000000L && r("burst").getBoolean(5))
  }

  test("fanoReport: single-day key reports NULL ratio") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(("solo", ts("2024-01-01 10:00:00")))
      .toDF("event_type", "ts")
    val r = TimeSeries.fanoReport(ev, "event_type").collect().head
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
