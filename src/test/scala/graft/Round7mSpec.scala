package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Concentration, Linkage}

/** Round-7 part eight: FS linkage EM + audience overlap. */
class Round7mSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("emWeights: a planted match cluster separates m from u") {
    import spark.implicits._
    // 100 planted matches (fields agree, deterministic few exceptions)
    // + 900 non-matches (fields mostly disagree)
    val matches = (0 until 100).map(i =>
      (i % 10 != 0, i % 7 != 0, i % 5 != 0))
    val nons = (0 until 900).map(i =>
      (i % 11 == 0, i % 13 == 0, i % 9 == 0))
    val pairs = (matches ++ nons).toDF("f1", "f2", "f3")
    val r = Linkage.emWeights(pairs, Seq("f1", "f2", "f3")).collect().head
    assert(r.getLong(0) == 1000L)
    val lam = r.getLong(1)
    assert(lam > 50000L && lam < 250000L, s"lambda $lam") // ~10% planted
    // every field must discriminate: m well above u
    for (f <- 0 until 3) {
      val m = r.getLong(2 + 2 * f); val u = r.getLong(3 + 2 * f)
      assert(m > u + 300000L, s"field $f: m=$m u=$u")
    }
    val matched = r.getLong(8)
    assert(matched > 60L && matched < 220L, s"n_matched $matched")
  }

  test("emWeights: a rare independent noise field does not separate") {
    import spark.implicits._
    // f1 carries the class signal; f2 is RARE independent noise (a
    // 50/50 independent field would itself be a competing latent
    // split — the classic EM identifiability caveat, so the fixture
    // keeps noise rare in both classes)
    // 12 rounds: the aggressive symmetric prior (m=0.9) leaves the
    // noise field visibly inflated after 2 rounds; convergence washes
    // it toward the base rate
    val pairs = (0 until 1000).map(i =>
      (i < 100, i % 17 == 0)).toDF("f1", "f2")
    val r = Linkage.emWeights(pairs, Seq("f1", "f2"), rounds = 12)
      .collect().head
    val (m1, u1) = (r.getLong(2), r.getLong(3))
    val (m2, u2) = (r.getLong(4), r.getLong(5))
    assert(m1 > u1 + 300000L, s"signal field separates: m=$m1 u=$u1")
    assert(math.abs(m2 - u2) < 200000L,
      s"noise field should not separate: m=$m2 u=$u2")
  }

  test("audienceOverlap: hand-computed intersections and jaccard") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (4L, "c"), (1L, "a")) // duplicate row must not double-count
      .toDF("user_id", "event_type")
    val r = Concentration.audienceOverlap(ev).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // a: {1,2,3}, b: {1,2}, c: {4}
    assert(r(("a", "b")) == (3L, 2L, 2L, 666666L)) // 2/3 jaccard
    assert(!r.contains(("a", "c")) && !r.contains(("b", "c")))
  }
}
