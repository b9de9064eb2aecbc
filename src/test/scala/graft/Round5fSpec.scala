package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{ProfileDrift, SkewReport, Standardize, TimeSeries}

/** Part-six operators: PSI distribution drift, rolling calendar-window
  * activity, join-key skew census, per-group z-score standardization.
  */
class Round5fSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------------
  // ProfileDrift.psiReport
  // ------------------------------------------------------------------

  test("psiReport: identical snapshots score exactly zero") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
      ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val got = ProfileDrift.psiReport(df, df, "g", "v", nBins = 4)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 4L, 4L, 0.0), ("b", 2L, 2L, 0.0)))
  }

  test("psiReport: a shifted distribution scores past the 0.25 alarm") {
    // reference uniform over [0, 100); current piles everything at the
    // top of the range — the textbook "feature moved" case
    val ref = (0 until 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val cur = (0 until 100).map(i => ("a", 95.0 + (i % 5))).toDF("g", "v")
    val Array((psiSame, psiShift)) =
      ProfileDrift.psiReport(ref, ref, "g", "v").select("psi")
        .crossJoin(ProfileDrift.psiReport(ref, cur, "g", "v")
          .select(col("psi").as("psi2")))
        .as[(Double, Double)].collect()
    assert(psiSame == 0.0)
    assert(psiShift > 0.25, s"shifted PSI should alarm, got $psiShift")
  }

  test("psiReport: out-of-range current values clamp into the edge bins") {
    val ref = Seq(("a", 0.0), ("a", 10.0)).toDF("g", "v")
    val cur = Seq(("a", -50.0), ("a", 999.0)).toDF("g", "v")
    val rows = ProfileDrift.psiReport(ref, cur, "g", "v", nBins = 2)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length == 1 && rows(0)._2 == 2L && rows(0)._3 == 2L)
  }

  test("psiReport: groups on only one side are skipped, not scored") {
    val ref = Seq(("a", 1.0), ("gone", 2.0)).toDF("g", "v")
    val cur = Seq(("a", 1.5), ("new", 9.0)).toDF("g", "v")
    val gs = ProfileDrift.psiReport(ref, cur, "g", "v")
      .select("g").as[String].collect().toSet
    assert(gs == Set("a"))
  }

  // ------------------------------------------------------------------
  // TimeSeries.rollingActivity
  // ------------------------------------------------------------------

  private def ev(day: Int, user: Long, value: Double) =
    (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), user, value)

  test("rollingActivity: hand-computed 2-day window") {
    // day 1: users {1,2}; day 2: {2}; day 4: {3} (day 3 silent)
    val events = Seq(ev(1, 1L, 1.0), ev(1, 2L, 2.0), ev(2, 2L, 4.0),
      ev(4, 3L, 8.0)).toDF("ts", "user_id", "value")
    val got = TimeSeries.rollingActivity(events, windowDays = 2)
      .withColumn("day", col("day").cast("string"))
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 2L, 2L, 2L, 3.0),   // window = day 1 only
      ("2024-01-02", 1L, 1L, 2L, 3L, 7.0),   // users {1,2} over days 1-2
      ("2024-01-04", 1L, 1L, 1L, 1L, 8.0)))  // day 3 empty, window = day 4
  }

  test("rollingActivity: windowDays=1 degenerates to the daily report") {
    val events = Seq(ev(1, 1L, 1.5), ev(1, 1L, 2.5), ev(2, 2L, 3.0))
      .toDF("ts", "user_id", "value")
    val rows = TimeSeries.rollingActivity(events, windowDays = 1).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("wau") == r.getAs[Long]("dau"))
      assert(r.getAs[Long]("n_events_roll") == r.getAs[Long]("n_events"))
    }
  }

  test("rollingActivity: no phantom days past the observed range") {
    val events = Seq(ev(5, 1L, 1.0)).toDF("ts", "user_id", "value")
    val days = TimeSeries.rollingActivity(events, windowDays = 7)
      .select(col("day").cast("string")).as[String].collect().toSeq
    assert(days == Seq("2024-01-05"))
  }

  // ------------------------------------------------------------------
  // SkewReport.keySkew
  // ------------------------------------------------------------------

  test("keySkew: hand-computed census, ties broken by key") {
    // key 7 × 4 rows, keys 1 and 3 × 2 rows each (tie), key 9 × 1
    val df = (Seq.fill(4)(7L) ++ Seq(1L, 1L, 3L, 3L, 9L)).toDF("k")
    val got = SkewReport.keySkew(df, "k", topN = 3)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1, 7L, 4L, 4444.4444, 4444.4444),
      (2, 1L, 2L, 2222.2222, 6666.6667),
      (3, 3L, 2L, 2222.2222, 8888.8889)))
  }

  test("keySkew: topN past the key count returns every key") {
    val df = Seq(1L, 2L, 2L).toDF("k")
    assert(SkewReport.keySkew(df, "k", topN = 50).count() == 2)
  }

  // ------------------------------------------------------------------
  // Standardize.zScore
  // ------------------------------------------------------------------

  test("zScore: hand-computed scores; zero-spread group gets NULL, keeps rows") {
    // group a: values 1, 3 -> mu=2, sigma=sqrt(2); group b constant
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 5L))
      .toDF("source", "n")
    val got = Standardize.zScore(df, "source", "n")
    assert(got.count() == 4)
    val za = got.filter(col("source") === "a" && col("n") === 3)
      .select("z").as[Double].collect()(0)
    assert(za == math.floor((3.0 - 2.0) / 1.414214 * 10000 + 0.5) / 10000)
    assert(got.filter(col("source") === "b").select("z")
      .collect().forall(_.isNullAt(0)))
  }
}
