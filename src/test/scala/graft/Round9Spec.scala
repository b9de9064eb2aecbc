package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Deciles, Graph, Preference, Similarity, SketchRollup}

/** Round-9 part one specs: the sketch-fidelity query forms (exact-twin
  * values + frozen-bound validity flags), the generalized ANN recall
  * grader, the driver-side collect guards, and the mixed-sign packed-key
  * guard.
  */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---------------------------------------------------------------
  // Guards.countedCollect
  // ---------------------------------------------------------------

  test("countedCollect: passes at the cap, fails loudly one past it") {
    val atCap = spark.range(10).toDF("x")
    assert(graft.util.Guards.countedCollect(atCap, "op", cap = 10)
      .length === 10)
    val over = spark.range(11).toDF("x")
    val e = intercept[IllegalArgumentException] {
      graft.util.Guards.countedCollect(over, "bradleyTerry", cap = 10)
    }
    assert(e.getMessage.contains("bradleyTerry"), e.getMessage)
    assert(e.getMessage.contains("driver-side cap"), e.getMessage)
  }

  test("bradleyTerry: an over-cap census fails before collecting it") {
    import spark.implicits._
    val big = spark.range(graft.util.Guards.MaxCensusRows + 1)
      .select(col("id").as("item_a"), (col("id") + 1).as("item_b"),
        lit(1L).as("wins_a"), lit(0L).as("wins_b"))
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(big, rounds = 1)
    }
    assert(e.getMessage.contains("bradleyTerry"), e.getMessage)
  }

  test("krippendorffAlpha: an item rated past maxRaters fails loudly") {
    import spark.implicits._
    val ratings = Seq((1L, "a"), (1L, "b"), (1L, "a"),
      (2L, "a"), (2L, "b")).toDF("item", "cat")
    val e = intercept[IllegalArgumentException] {
      Preference.krippendorffAlpha(ratings, "item", "cat", maxRaters = 2)
        .collect()
    }
    assert(e.getMessage.contains("maxRaters"), e.getMessage)
    graft.util.Caches.releaseAll()
    // and at a truthful cap the same panel fits
    val ok = Preference.krippendorffAlpha(ratings, "item", "cat",
      maxRaters = 3).collect()
    assert(ok.length === 1)
    graft.util.Caches.releaseAll()
  }

  // ---------------------------------------------------------------
  // ipwAte: the decimal-first cast must survive warehouse-scale
  // outcomes (|y| > 9.2e6 units overflowed the old LONG product)
  // ---------------------------------------------------------------

  test("ipwAte: 2e7-unit outcomes compute exactly (old LONG cell " +
    "product wrapped at ~9.2e6)") {
    import spark.implicits._
    // one bin, e = 0.5: ATE = 2e7 − 1e7 = 1e7 units = 1e13 micro
    val df = Seq(
      ("b", true, 2.0e7), ("b", true, 2.0e7),
      ("b", false, 1.0e7), ("b", false, 1.0e7))
      .toDF("bin", "treat", "y")
    val r = graft.operators.Experiment.ipwAte(df, col("treat"),
      col("y"), col("bin")).collect()(0)
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getLong(3) === 10000000000000L, r.toString)
    assert(r.getLong(4) === 10000000000000L, r.toString)
    graft.util.Caches.releaseAll()
  }

  // ---------------------------------------------------------------
  // adamicAdarTopK: mixed-sign node ids must not take the packed path
  // ---------------------------------------------------------------

  test("adamicAdarTopK: mixed-sign ids score identically to the same " +
    "graph shifted non-negative") {
    import spark.implicits._
    // K4 minus one edge on ids {-2, -1, 1, 2}; shift +10 → {8, 9, 11, 12}
    val edges = Seq((-2L, -1L), (-2L, 1L), (-1L, 1L), (-1L, 2L), (1L, 2L))
    val neg = Graph.adamicAdarTopK(
      edges.toDF("node_a", "node_b"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    graft.util.Caches.releaseAll()
    val pos = Graph.adamicAdarTopK(
      edges.map { case (a, b) => (a + 10, b + 10) }
        .toDF("node_a", "node_b"), 10)
      .collect().map(r => (r.getLong(0) - 10, r.getLong(1) - 10,
        r.getLong(2), r.getLong(3))).toSet
    graft.util.Caches.releaseAll()
    assert(neg === pos)
  }

  // ---------------------------------------------------------------
  // recallVsExact
  // ---------------------------------------------------------------

  test("recallVsExact: the exact ranking grades itself at 100% and a " +
    "disjoint ranking at 0") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.load(spark, sf, "embeddings")
    val qids = Seq(0L, 1L)
    val exact = Similarity.bruteForceTopK(e, qids, 3)
    val self = Similarity.recallVsExact(e, exact, qids, 3).collect()
    assert(self.length === 2)
    self.foreach { r =>
      assert(r.getLong(4) === 1000000L, r.toString)
      assert(r.getLong(1) === r.getLong(3), r.toString)
    }
    import spark.implicits._
    val none = Similarity.recallVsExact(e,
      Seq((0L, -100L), (1L, -101L)).toDF("query_id", "vec_id"),
      qids, 3).collect()
    none.foreach { r =>
      assert(r.getLong(3) === 0L && r.getLong(4) === 0L, r.toString)
    }
    graft.util.Caches.releaseAll()
  }

  // ---------------------------------------------------------------
  // Deciles.boundaryFidelity
  // ---------------------------------------------------------------

  test("boundaryFidelity: uniform 1..100 yields the textbook quantiles, " +
    "all within bound") {
    import spark.implicits._
    val df = (1 to 100).map(v => ("g", v.toLong, v.toLong))
      .toDF("source", "doc_id", "n_tokens")
    val rows = Deciles.boundaryFidelity(df, "source", "n_tokens")
      .collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      val i = r.getInt(1)
      assert(r.getLong(2) === 100L)
      // quantile_cont at i/10 over 1..100: 1 + 99·i/10
      assert(r.getDouble(3) === 1.0 + 99.0 * i / 10.0, r.toString)
      assert(r.getBoolean(4), r.toString)
    }
  }

  test("boundaryFidelity: heavy ties collapse the window and still pass") {
    import spark.implicits._
    // 90% of mass on one value — most boundaries sit on the tie
    val df = (Seq.fill(90)(7L) ++ (1L to 10L))
      .zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("source", "doc_id", "n_tokens")
    val rows = Deciles.boundaryFidelity(df, "source", "n_tokens")
      .collect()
    assert(rows.length === 9)
    assert(rows.forall(_.getBoolean(4)), rows.mkString("; "))
  }

  // ---------------------------------------------------------------
  // SketchRollup.weeklyDistinctChecked
  // ---------------------------------------------------------------

  test("weeklyDistinctChecked: exact columns match the exact twin and " +
    "the HLL band holds on the fixture") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val checked = SketchRollup.weeklyDistinctChecked(ev).collect()
    val exact = SketchRollup.weeklyDistinctExact(ev).collect()
    assert(checked.length === exact.length && checked.nonEmpty)
    checked.zip(exact).foreach { case (c, e) =>
      assert(c.getDate(0) === e.getDate(0))
      assert(c.getLong(3) === e.getLong(3), s"distinct_exact: $c vs $e")
      assert(c.getBoolean(4), s"HLL estimate out of band: $c")
    }
  }

  // ---------------------------------------------------------------
  // Profiler.approxFidelityProfile
  // ---------------------------------------------------------------

  test("approxFidelityProfile: full grid, exact values, sketch flags " +
    "green, moment flags null") {
    import spark.implicits._
    val df = (1 to 100).map(v => (v.toDouble, v.toLong))
      .toDF("x", "y")
    val rows = graft.core.Profiler.approxFidelityProfile(df).collect()
    assert(rows.length === 20, s"grid: ${rows.length}")
    val sketch = Set("distinct_count", "p25", "median", "p75")
    rows.foreach { r =>
      val metric = r.getString(1)
      if (sketch(metric)) assert(r.getBoolean(3), r.toString)
      else assert(r.isNullAt(3), r.toString)
    }
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byKey(("x", "median")).getDouble(2) === 50.5)
    assert(byKey(("x", "distinct_count")).getDouble(2) === 100.0)
    assert(byKey(("y", "p25")).getDouble(2) === 25.75)
  }
}
