package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, CorpusStats, Dedup, Pipeline, RangeJoin,
  Winsorize}

/** Part-five operators: interval-overlap join, vocabulary coverage,
  * filter funnel, as-of tolerance, winsorized stats, containment pairs.
  */
class Round5eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------------
  // RangeJoin.overlapJoin
  // ------------------------------------------------------------------

  test("overlapJoin: hand-computed pairs, duplicate-free across shared bins") {
    // left interval [0, 100) spans many bins with w=10; right [95, 105)
    // overlaps it in bin 9 only by the canonical rule. [200, 210) is
    // disjoint. [50, 60) is fully inside the left interval.
    val l = Seq((1L, 0L, 100L), (2L, 300L, 310L))
      .toDF("l_id", "l_lo", "l_hi")
    val r = Seq((10L, 95L, 105L), (11L, 200L, 210L), (12L, 50L, 60L))
      .toDF("r_id", "r_lo", "r_hi")
    val got = RangeJoin.overlapJoin(l, r, Seq.empty,
        "l_lo", "l_hi", "r_lo", "r_hi", binWidth = 10)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 12L)))
  }

  test("overlapJoin: result equals the brute-force inequality join for any bin width") {
    val l = (0L until 40L).map(i => (i, i * 7 % 50, i * 7 % 50 + 1 + i % 13))
      .toDF("l_id", "l_lo", "l_hi")
    val r = (0L until 40L).map(i => (i, i * 11 % 60, i * 11 % 60 + 1 + i % 9))
      .toDF("r_id", "r_lo", "r_hi")
    val brute = l.join(r, col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(1L, 3L, 10L, 100L)) {
      val got = RangeJoin.overlapJoin(l, r, Seq.empty,
          "l_lo", "l_hi", "r_lo", "r_hi", binWidth = w)
        .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == brute, s"binWidth=$w")
    }
  }

  test("overlapJoin: empty intervals match nothing; keys separate pairs") {
    val l = Seq(("a", 1L, 0L, 10L), ("a", 2L, 5L, 5L), ("b", 3L, 0L, 10L))
      .toDF("k", "l_id", "l_lo", "l_hi")
    val r = Seq(("a", 10L, 5L, 15L), ("b", 11L, 20L, 30L))
      .toDF("k", "r_id", "r_lo", "r_hi")
    val got = RangeJoin.overlapJoin(l, r, Seq("k"),
        "l_lo", "l_hi", "r_lo", "r_hi", binWidth = 4)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // empty [5,5) matches nothing; cross-key overlap (3,10) is excluded
    assert(got == Set((1L, 10L)))
  }

  // ------------------------------------------------------------------
  // AsOfJoin tolerance
  // ------------------------------------------------------------------

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofLast tolerance: stale matches invalidated, never re-searched") {
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 13:00:00")))
      .toDF("user_id", "event_id", "ts")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), "early"),
      (1L, ts("2024-01-01 09:45:00"), "late"))
      .toDF("user_id", "ts", "tag")
    // unbounded: both left rows match the LATEST preceding right (09:45)
    val unbounded = AsOfJoin.asofLast(left, right, Seq("user_id"),
      "ts", "ts", Seq("tag"))
    assert(unbounded.select("event_id", "tag").as[(Long, String)]
      .collect().toSet == Set((100L, "late"), (101L, "late")))
    // 1 h tolerance: 10:00 is 15 min past 09:45 (keep); 13:00 is stale.
    // Crucially the stale row does NOT fall back to 09:30 — tolerance
    // invalidates, it never reaches further back.
    val inner = AsOfJoin.asofLast(left, right, Seq("user_id"),
      "ts", "ts", Seq("tag"), maxGapSeconds = Some(3600L))
    assert(inner.select("event_id", "tag").as[(Long, String)]
      .collect().toSet == Set((100L, "late")))
    val leftJoin = AsOfJoin.asofLast(left, right, Seq("user_id"),
      "ts", "ts", Seq("tag"), joinType = "left", maxGapSeconds = Some(3600L))
    assert(leftJoin.select("event_id", "tag").as[(Long, Option[String])]
      .collect().toSet == Set((100L, Some("late")), (101L, None)))
  }

  test("asofLast tolerance: huge gap reduces to the unbounded join on fixture data") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("p_event"))
    def run(gap: Option[Long]) =
      AsOfJoin.asofLast(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("p_event"), maxGapSeconds = gap)
        .select("event_id", "p_event").as[(Long, Long)].collect().toSet
    assert(run(Some(100L * 365 * 86400)) == run(None))
    // and a zero gap keeps only exact-timestamp matches (a subset)
    assert(run(Some(0L)).subsetOf(run(None)))
  }

  // ------------------------------------------------------------------
  // CorpusStats.vocabCoverage
  // ------------------------------------------------------------------

  test("vocabCoverage: hand-computed OOV against a top-2 vocabulary") {
    val docs = Seq(
      (1L, "s1", "aa aa bb cc"), // vocab {aa,bb}: 1 OOV of 4
      (2L, "s2", "bb bb aa dd dd")) // 2 OOV of 5
      .toDF("doc_id", "source", "text")
    // counts: aa=3, bb=3, cc=1, dd=2 → top-2 (count desc, term asc) = aa, bb
    val rows = CorpusStats.vocabCoverage(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("s1", 4L, 1L), ("s2", 5L, 2L)))
  }

  test("vocabCoverage: full-vocabulary size gives zero OOV everywhere") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val report = CorpusStats.vocabCoverage(docs, 100000)
    assert(report.agg(sum("n_oov")).collect().head.getLong(0) == 0L)
  }

  // ------------------------------------------------------------------
  // Pipeline.filterFunnel
  // ------------------------------------------------------------------

  test("filterFunnel: hand-computed cascade accounting") {
    val df = Seq((1, 10), (2, 20), (3, 30), (4, 40)).toDF("id", "v")
    val got = Pipeline.filterFunnel(df, Seq(
        "ge20" -> (col("v") >= 20),
        "le30" -> (col("v") <= 30)))
      .orderBy("stage")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got == Seq((0, "input", 4L, 0L), (1, "ge20", 3L, 1L),
      (2, "le30", 2L, 1L)))
  }

  test("filterFunnel: passes are monotone non-increasing and drops reconcile") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = Pipeline.filterFunnel(docs, Seq(
        "chars" -> col("n_chars").between(100, 500),
        "lang" -> col("lang").isin("en", "de"),
        "even" -> (col("doc_id") % 2 === 0)))
      .orderBy("stage").collect()
    val passes = rows.map(_.getLong(2))
    assert(passes.zip(passes.tail).forall { case (a, b) => a >= b })
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getLong(3) == prev.getLong(2) - cur.getLong(2))
    }
  }

  // ------------------------------------------------------------------
  // Winsorize
  // ------------------------------------------------------------------

  test("winsorizedStats: hand-computed clamp on a known distribution") {
    // g: values 0..10 plus an outlier 1000. p05/p95 over 12 values:
    // pos_lo = 11*0.05 = 0.55 → 0 + 0.55*(1-0) = 0.55
    // pos_hi = 11*0.95 = 10.45 → 10 + 0.45*(1000-10) = 455.5
    val df = ((0 to 10).map(v => ("g", v)) :+ (("g", 1000))).toDF("grp", "v")
    val row = Winsorize.winsorizedStats(df, "grp", "v", 0.05, 0.95).collect().head
    assert(row.getLong(row.fieldIndex("n")) == 12L)
    assert(math.abs(row.getDouble(row.fieldIndex("lo")) - 0.55) < 1e-9)
    assert(math.abs(row.getDouble(row.fieldIndex("hi")) - 455.5) < 1e-9)
    // clamped sum: 0.55 + 1..10 (=55) + 455.5 = 511.05 → micro 511050000
    assert(row.getLong(row.fieldIndex("wsum_micro")) == 511050000L)
  }

  test("winsorizedStats: approx path bounds within tolerance of exact") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Winsorize.winsorizedStats(docs, "source", "n_chars", 0.05, 0.95)
      .select("source", "lo", "hi").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Winsorize.winsorizedStats(docs, "source", "n_chars",
        0.05, 0.95, exact = false)
      .select("source", "lo", "hi").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (s, (lo, hi)) =>
      val (alo, ahi) = approx(s)
      // approx_percentile returns an actual value near the percentile;
      // with ~25 docs per source the neighbor-value slack is wide, but
      // bounds must stay inside the group's value range and ordered
      assert(alo <= ahi)
      assert(math.abs(alo - lo) <= (hi - lo))
      assert(math.abs(ahi - hi) <= (hi - lo))
    }
  }

  test("winsorized mean is outlier-resistant where the raw mean is not") {
    val base = (0 until 100).map(v => ("g", v.toDouble))
    val spiked = base :+ (("g", 1e9))
    val df = spiked.toDF("grp", "v")
    val w = Winsorize.winsorizedStats(df, "grp", "v", 0.05, 0.95)
      .collect().head
    val wmean = w.getDouble(w.fieldIndex("wmean"))
    val rawMean = df.agg(avg("v")).collect().head.getDouble(0)
    assert(rawMean > 1e6) // destroyed by the outlier
    assert(wmean < 100) // robust
  }

  // ------------------------------------------------------------------
  // Dedup.containmentPairs
  // ------------------------------------------------------------------

  test("containmentPairs: a quoted subset scores ~1 from the short side, low Jaccard") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 8).map(i => s"w$i").mkString(" ") // bigrams subset of long
    val docs = Seq((1L, "en", long), (2L, "en", short), (3L, "en",
      (100 to 140).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val rows = Dedup.containmentPairs(docs, "lang", 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(r.fieldIndex("cont_a")), r.getDouble(r.fieldIndex("cont_b")))))
      .toMap
    assert(rows.keySet == Set((1L, 2L)))
    val (contLong, contShort) = rows((1L, 2L))
    assert(contShort == 1.0) // all of short's bigrams are inside long
    assert(contLong < 0.4) // the long side is mostly unshared
    // symmetric Jaccard would be ~7/39 ≈ 0.18 — below any useful cut;
    // containment is exactly the axis that catches this pair
  }

  test("containmentPairs: consistency with jaccardPairs intersections") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cont = Dedup.containmentPairs(docs, "lang", 0.5)
      .select("doc_a", "doc_b", "cont_a", "cont_b").collect()
    cont.foreach { r =>
      assert(r.getDouble(2) <= 1.0 && r.getDouble(3) <= 1.0)
      assert(math.max(r.getDouble(2), r.getDouble(3)) >= 0.5)
    }
  }
}
