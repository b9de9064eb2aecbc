package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Preference

/** Round-8 part nine specs: matchup census, Bradley–Terry, Wilson
  * win rates, McNemar, Fleiss' κ.
  */
class Round8iSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def matchupFixture = {
    import spark.implicits._
    // 3 units; x beats y for u1/u2, loses for u3; z ties y at u3
    Seq(
      (1L, "x", 5.0), (1L, "y", 1.0),
      (2L, "x", 4.0), (2L, "y", 2.0), (2L, "z", 9.0),
      (3L, "x", 1.0), (3L, "y", 3.0), (3L, "z", 3.0))
      .toDF("u", "it", "v")
  }

  test("matchupCensus: winners, ties, and decision counts by hand") {
    val m = Preference.matchupCensus(matchupFixture, "u", "it", "v")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(m.toSet === Set(
      ("x", "y", 2L, 1L, 0L, 3L),   // u1,u2 x wins; u3 y wins
      ("x", "z", 0L, 2L, 0L, 2L),   // z beats x at u2 and u3
      ("y", "z", 0L, 1L, 1L, 1L)),  // u2 z wins; u3 exact tie
      m.mkString(","))
  }

  test("bradleyTerry: dominance ranks first, mass is conserved") {
    import spark.implicits._
    // a beats b 9:1, b beats c 9:1, a beats c 10:0 — transitive
    val m = Seq(
      ("a", "b", 9L, 1L), ("b", "c", 9L, 1L), ("a", "c", 10L, 0L))
      .toDF("item_a", "item_b", "wins_a", "wins_b")
    val bt = Preference.bradleyTerry(m, 2).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    val byRank = bt.sortBy(_._3).map(_._1).toSeq
    assert(byRank === Seq("a", "b", "c"), bt.mkString(","))
    val mass = bt.map(_._2).sum
    // sum-normalized to K·10⁶ up to one truncation unit per item
    assert(math.abs(mass - 3000000L) <= 3, s"mass $mass")
    val s = bt.map(t => t._1 -> t._2).toMap
    assert(s("a") > s("b") && s("b") > s("c"), bt.mkString(","))
  }

  test("bradleyTerry: zero-decision pairs drop, undefeated dominates") {
    import spark.implicits._
    val m = Seq(("a", "b", 7L, 0L), ("a", "c", 0L, 0L))
      .toDF("item_a", "item_b", "wins_a", "wins_b")
    val bt = Preference.bradleyTerry(m, 2).collect()
    // c never played a decided game — excluded
    assert(bt.map(_.getString(0)).toSet === Set("a", "b"))
    val s = bt.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(s("a") > s("b"))
    // b's strength floors to 0 (W_b = 0) and a absorbs the mass
    assert(s("b") === 0L && s("a") === 2000000L, s.toString)
  }

  test("bradleyTerry: input row order cannot move a strength") {
    import spark.implicits._
    val rows = Seq(("a", "b", 9L, 1L), ("b", "c", 9L, 1L),
      ("a", "c", 10L, 0L))
    def fit(s: Seq[(String, String, Long, Long)]) =
      Preference.bradleyTerry(
        s.toDF("item_a", "item_b", "wins_a", "wins_b"), 2)
        .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(fit(rows) === fit(rows.reverse))
  }

  test("winRateMatrix: sweep and Wilson bounds behave") {
    import spark.implicits._
    val m = Seq(("a", "b", 8L, 2L)).toDF("item_a", "item_b",
      "wins_a", "wins_b")
    val w = Preference.winRateMatrix(m).collect()
      .map(r => (r.getString(0), r.getLong(4), r.getDouble(5),
        r.getDouble(6))).sortBy(_._1)
    val Seq(a, b) = w.toSeq
    assert(a._2 === 800000L && b._2 === 200000L)
    // Wilson stays inside (0,1) and brackets the plug-in rate
    assert(a._3 > 0.0 && a._4 < 1.0 && a._3 < 0.8 && a._4 > 0.8)
    // the two directions mirror: lo_a = 1 - hi_b up to rounding
    assert(math.abs(a._3 - (1.0 - b._4)) < 2e-6, w.mkString(","))
  }

  test("mcnemar: hand-computed discordant cells and statistic") {
    import spark.implicits._
    val pairs = (Seq.fill(3)((true, false)) ++ Seq.fill(1)((false, true)) ++
      Seq.fill(5)((true, true)) ++ Seq.fill(2)((false, false)))
      .toDF("a", "b")
    val r = Preference.mcnemar(pairs, "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((11L, 3L, 1L, 5L, 2L)))
    // ((|3-1|-1)^2)/(3+1) = 0.25
    assert(r.getDouble(5) === 0.25)
    // no discordance -> undefined
    val none = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Preference.mcnemar(none, "a", "b").collect()(0).isNullAt(5))
  }

  test("fleissKappa: perfect agreement is 1, hand case is -1/3") {
    import spark.implicits._
    val perfect = Seq(
      (1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"))
      .toDF("item", "cat")
    val p = Preference.fleissKappa(perfect, "item", "cat", 2)
      .collect()(0)
    assert(p.getDouble(5) === 1.0, p.toString)
    // items (A,A) and (A,B): PA=0.5, Pe=0.625, kappa=-1/3
    val mixed = Seq(
      (1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"))
      .toDF("item", "cat")
    val m = Preference.fleissKappa(mixed, "item", "cat", 2)
      .collect()(0)
    assert(m.getDouble(3) === 0.5 && m.getDouble(4) === 0.625,
      m.toString)
    assert(m.getDouble(5) === -0.333333, m.toString)
    // an item with only 1 rating is excluded from the panel
    val ragged = Seq(
      (1L, "A"), (1L, "A"), (2L, "A"))
      .toDF("item", "cat")
    val g = Preference.fleissKappa(ragged, "item", "cat", 2)
      .collect()(0)
    assert(g.getLong(0) === 1L, g.toString)
  }
}
