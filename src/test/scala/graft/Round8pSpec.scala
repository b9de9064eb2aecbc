package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Experiment

/** Round-8 part sixteen specs: Wald's SPRT. */
class Round8pSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sprt(rows: Seq[(String, Long, Int)]) = {
    import spark.implicits._
    Experiment.sprtReport(rows.toDF("g", "ord", "y"), "g",
      Seq("ord"), col("y") === 1, 400000L, 500000L, 50000L, 50000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(4),
        if (r.isNullAt(5)) -1 else r.getInt(5)))).toMap
  }

  test("sprt: all-success crosses h1 at exactly 14, all-fail h0 at 17") {
    // posInc = ln(1.25) nano ≈ 0.2231e9, upper = ln(19) ≈ 2.9444e9:
    // 14 successes cross; negInc = ln(5/6) ≈ -0.1823e9: 17 failures
    val rows =
      (1 to 30).map(i => ("up", i.toLong, 1)) ++
        (1 to 30).map(i => ("dn", i.toLong, 0)) ++
        Seq(("mid", 1L, 1), ("mid", 2L, 0), ("mid", 3L, 1))
    val out = sprt(rows)
    assert(out("up") === (("h1", 14)), out.toString)
    assert(out("dn") === (("h0", 17)), out.toString)
    assert(out("mid") === (("none", -1)), out.toString)
  }

  test("sprt: the first boundary hit wins even if the path recrosses") {
    // 20 failures (h0 fires at 17) then 60 successes (would reach h1
    // later): the sequential decision is h0 at 17, not h1
    val rows = (1 to 20).map(i => ("g", i.toLong, 0)) ++
      (21 to 80).map(i => ("g", i.toLong, 1))
    val out = sprt(rows)
    assert(out("g") === (("h0", 17)), out.toString)
  }
}
