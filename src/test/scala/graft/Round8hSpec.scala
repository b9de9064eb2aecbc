package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, TimeSeries}

/** Round-8 part eight specs: Kruskal–Wallis, Brown–Forsythe, BH-FDR,
  * Page–Hinkley.
  */
class Round8hSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("kruskalWallis: shifted distributions score high, identical ~0") {
    import spark.implicits._
    val shifted = ((1 to 30).map(i => ("a", i.toDouble)) ++
      (1 to 30).map(i => ("b", i + 100.0))).toDF("g", "v")
    val hs = Correlate.kruskalWallis(shifted, "g", "v").collect()(0)
    // complete separation of two n=30 groups: H ≈ 44.26
    assert(hs.getDouble(2) > 40.0, s"$hs")
    assert(hs.getDouble(3) == 1.0, "no ties -> correction 1")
    val same = ((1 to 30).map(i => ("a", (i % 5).toDouble)) ++
      (1 to 30).map(i => ("b", (i % 5).toDouble))).toDF("g", "v")
    val h0 = Correlate.kruskalWallis(same, "g", "v").collect()(0)
    assert(math.abs(h0.getDouble(2)) < 1.0, s"identical: $h0")
    assert(h0.getDouble(3) < 1.0, "heavy ties -> correction < 1")
    graft.util.Caches.releaseAll()
  }

  test("brownForsythe: unequal spreads flag, equal spreads don't") {
    import spark.implicits._
    val unequal = ((1 to 40).map(i => ("tight", 100 + (i % 3).toDouble)) ++
      (1 to 40).map(i => ("wide", 100 + (i % 3) * 50.0))).toDF("g", "v")
    val f1 = Correlate.brownForsythe(unequal, "g", "v").collect()(0)
    assert(f1.getDouble(2) > 10.0, s"unequal spread: $f1")
    // same distribution, different locations: deviations identical
    val equal = ((1 to 40).map(i => ("lo", (i % 7).toDouble)) ++
      (1 to 40).map(i => ("hi", 1000 + (i % 7).toDouble))).toDF("g", "v")
    val f2 = Correlate.brownForsythe(equal, "g", "v").collect()(0)
    assert(f2.getDouble(2) == 0.0, s"equal spread: $f2")
    graft.util.Caches.releaseAll()
  }

  test("fdrBh: step-up adjustment, monotone and hand-checked") {
    import spark.implicits._
    // classic BH fixture: p = .01, .02, .03, .04, .5 (n=5).
    // cand_t = p_t·n/t = 50000, 50000, 50000, 50000, 500000; the
    // step-up min from the bottom leaves t1–t4 at 50000 (all
    // significant at α=.05 — BH's whole point vs Bonferroni, which
    // would keep only p ≤ 10000) and t5 at 500000.
    val df = Seq(("t1", 10000L), ("t2", 20000L), ("t3", 30000L),
      ("t4", 40000L), ("t5", 500000L)).toDF("id", "p_ppm")
    val r = Correlate.fdrBh(df, Seq("id"), "p_ppm", 50000L).collect()
      .map(x => x.getString(0) -> (x.getLong(3), x.getBoolean(4))).toMap
    assert(r("t1") == (50000L, true), s"$r")
    assert(r("t2") == (50000L, true), s"$r")
    assert(r("t3") == (50000L, true), s"$r")
    assert(r("t4") == (50000L, true), s"$r")
    assert(r("t5") == (500000L, false), s"$r")
    // a late small p pulls earlier larger ones down (the step-up):
    // p = .04, .05 with n=2 -> cand = 80000, 50000 -> both 50000
    val df2 = Seq(("a", 40000L), ("b", 50000L)).toDF("id", "p_ppm")
    val r2 = Correlate.fdrBh(df2, Seq("id"), "p_ppm", 50000L).collect()
      .map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r2("a") == 50000L && r2("b") == 50000L, s"$r2")
    // adjusted p is monotone in rank
    val seq = Correlate.fdrBh(df, Seq("id"), "p_ppm", 50000L).collect()
      .map(_.getLong(3))
    assert(seq.sameElements(seq.sorted), "monotone step-up")
  }

  test("pageHinkley: a volume step trips the running-mean detector") {
    import spark.implicits._
    // 10 days at 5 events, then 5 days at 50 — PH must alarm after
    // the step while the flat prefix stays silent
    val ev = (1 to 15).flatMap { d =>
      val n = if (d <= 10) 5 else 50
      (1 to n).map(k => ("api", ts(f"2024-01-$d%02d 12:00:00"), k.toLong))
    }.toDF("event_type", "ts", "event_id")
    val r = TimeSeries.pageHinkleyReport(ev, "event_type",
        lambdaCount = 20L)
      .collect().map(x => x.getDate(1).toString ->
        (x.getLong(3), x.getBoolean(4))).toMap
    assert(!r("2024-01-10")._2, s"flat prefix silent: $r")
    assert(r("2024-01-12")._2, s"step alarms: $r")
    assert(r("2024-01-15")._1 > r("2024-01-11")._1,
      "drift statistic accumulates")
    graft.util.Caches.releaseAll()
  }
}
