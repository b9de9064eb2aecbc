package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Preference}

/** Round-8 part eleven specs: Krippendorff's α, Mantel–Haenszel. */
class Round8kSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("krippendorffAlpha: unequal panels agree perfectly -> 1") {
    import spark.implicits._
    // 3 and 2 ratings — Fleiss would drop one item; Krippendorff keeps
    // both, and perfect within-item agreement reads 1 exactly
    val ratings = Seq(
      (1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "B"), (2L, "B"))
      .toDF("item", "cat")
    val r = Preference.krippendorffAlpha(ratings, "item", "cat", 3)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((2L, 5L)))
    assert(r.getDouble(3) === 1.0, r.toString)
  }

  test("krippendorffAlpha: hand-computed disagreement, -1/3") {
    import spark.implicits._
    // i1=(A,B,A), i2=(A,B): o_off_s=8 (S=2), n=5, D_e_s=24 -> -1/3
    val ratings = Seq(
      (1L, "A"), (1L, "B"), (1L, "A"),
      (2L, "A"), (2L, "B"))
      .toDF("item", "cat")
    val r = Preference.krippendorffAlpha(ratings, "item", "cat", 3)
      .collect()(0)
    assert(r.getDouble(3) === -0.333333, r.toString)
    // single-rating items are excluded but don't crash
    val ragged = ratings.union(Seq((3L, "A")).toDF("item", "cat"))
    val r2 = Preference.krippendorffAlpha(ragged, "item", "cat", 3)
      .collect()(0)
    assert(r2.getLong(0) === 2L && r2.getDouble(3) === -0.333333)
    // one category only -> expected disagreement 0 -> NULL
    val mono = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"))
      .toDF("item", "cat")
    assert(Preference.krippendorffAlpha(mono, "item", "cat", 2)
      .collect()(0).isNullAt(3))
  }

  private def mhRows(spec: Seq[(Long, Int, Int, Int, Int)]) = {
    import spark.implicits._
    spec.flatMap { case (s, a, b, c, d) =>
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++
        Seq.fill(d)((s, false, false))
    }.toDF("stratum", "e", "y")
  }

  test("mantelHaenszel: hand-computed pooled OR and CMH") {
    // s1 null (OR=1), s2 strong: OR_MH = (2.5+8)/(2.5+0.5) = 3.5
    val df = mhRows(Seq((1L, 10, 10, 10, 10), (2L, 20, 5, 5, 20)))
    val r = Experiment.mantelHaenszel(df, "stratum", col("e"),
      col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((90L, 2L, 30L)))
    assert(r.getDouble(3) === 3.5, r.toString)
    // E=22.5, V=2.564102+3.188775 micro-floored -> chi2 ~ 8.52
    assert(r.getDouble(4) > 8.0 && r.getDouble(4) < 9.0, r.toString)
  }

  test("mantelHaenszel: degenerate denominators go NULL, not NaN") {
    // no discordant bc product anywhere -> OR undefined
    val df = mhRows(Seq((1L, 5, 0, 0, 5)))
    val r = Experiment.mantelHaenszel(df, "stratum", col("e"),
      col("y")).collect()(0)
    assert(r.isNullAt(3), r.toString)
    // a single-row stratum has V=0 -> chi2 NULL
    val tiny = mhRows(Seq((1L, 1, 0, 0, 0)))
    val r2 = Experiment.mantelHaenszel(tiny, "stratum", col("e"),
      col("y")).collect()(0)
    assert(r2.isNullAt(4), r2.toString)
  }
}
