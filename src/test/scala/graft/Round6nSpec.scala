package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AssociationRules, ProfileDrift}

/** Round-6 part fifteen: Mann–Whitney rank-sum, Welch's t, association
  * rules.
  */
class Round6nSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df1(vs: Seq[Double]) = {
    import spark.implicits._
    vs.map(("g", _)).toDF("k", "value")
  }

  test("rankSumReport: dominance reads ±1 rank-biserial") {
    // ref entirely below cur → ref never larger → r_rb = −1
    val lo = ProfileDrift.rankSumReport(
      df1(Seq(1.0, 2.0)), df1(Seq(3.0)), "k", "value").collect().head
    assert(lo.getLong(3) == 0L)          // u2
    assert(lo.getDouble(5) == -1.0)      // r_rb
    // ref entirely above cur → r_rb = +1
    val hi = ProfileDrift.rankSumReport(
      df1(Seq(3.0)), df1(Seq(1.0, 2.0)), "k", "value").collect().head
    assert(hi.getLong(3) == 4L && hi.getDouble(5) == 1.0)
  }

  test("rankSumReport: single shared value ties out — r 0, z NULL") {
    val r = ProfileDrift.rankSumReport(
      df1(Seq(1.0)), df1(Seq(1.0)), "k", "value").collect().head
    assert(r.getLong(3) == 1L)           // u2 = 2·(0 + ½)
    assert(r.getLong(4) == 6L)           // tie3 = 2³−2
    assert(r.getDouble(5) == 0.0)        // r_rb
    assert(r.isNullAt(6))                // variance 0 → z NULL
  }

  test("rankSumReport: hand-computed z on a shifted sample") {
    // ref {1,2,3}, cur {2,3,4}: u2 per cell — v=2: 1·(2·1−1)=1,
    // v=3: 1·(2·2−1)=3 → u2=4; ties at 2 and 3: tie3 = 6+6 = 12
    // var = (9/12)·(7 − 12/30) = 4.95; z = (4−9)/(2·√4.95) = −1.123666
    val r = ProfileDrift.rankSumReport(
      df1(Seq(1.0, 2.0, 3.0)), df1(Seq(2.0, 3.0, 4.0)), "k", "value")
      .collect().head
    assert(r.getLong(3) == 4L && r.getLong(4) == 12L)
    assert(r.getDouble(6) == math.rint(
      (4.0 - 9.0) / (2.0 * math.sqrt(4.95)) * 1e6) / 1e6)
  }

  test("welchTReport: hand-computed t and Welch df") {
    val r = ProfileDrift.welchTReport(
      df1(Seq(1.0, 2.0, 3.0)), df1(Seq(2.0, 4.0, 6.0)), "k", "value")
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(5) == 1000000L)     // var{1000,2000,3000} milli²
    assert(r.getLong(6) == 4000000L)
    val se1 = 1000000.0 / 3; val se2 = 4000000.0 / 3; val se = se1 + se2
    assert(r.getDouble(7) == math.rint(
      (2000.0 - 4000.0) / math.sqrt(se) * 1e6) / 1e6)
    assert(r.getDouble(8) == math.rint(
      se * se / (se1 * se1 / 2 + se2 * se2 / 2) * 1e3) / 1e3)
  }

  test("welchTReport: identical sides → t = 0; constants → NULL") {
    val same = ProfileDrift.welchTReport(
      df1(Seq(1.0, 5.0)), df1(Seq(1.0, 5.0)), "k", "value").collect().head
    assert(same.getDouble(7) == 0.0)
    val const = ProfileDrift.welchTReport(
      df1(Seq(2.0, 2.0)), df1(Seq(3.0, 3.0)), "k", "value").collect().head
    assert(const.isNullAt(7) && const.isNullAt(8)) // both variances 0
  }

  test("association rules: downward-closure prune and pair floor bind") {
    import spark.implicits._
    val baskets = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "c"),
      (4L, "c"), (4L, "d")).toDF("g", "it")
    val r = AssociationRules.rules(baskets, "g", "it", minSupport = 2)
      .collect()
    // d (support 1) pruned before the pair join; (a,c)/(b,c) fall at the
    // pair floor → only a↔b survives, in both directions
    assert(r.map(x => (x.getString(0), x.getString(1))).toSet ==
      Set(("a", "b"), ("b", "a")))
    val ab = r.find(_.getString(0) == "a").get
    assert(ab.getLong(2) == 4L)          // n_baskets
    assert(ab.getLong(3) == 3L && ab.getLong(4) == 3L) // n_ante, n_cons
    assert(ab.getLong(5) == 3L)          // n_both
    assert(ab.getLong(6) == 750000L)     // supp: 3e6 div 4
    assert(ab.getLong(7) == 1000000L)    // conf: 3e6 div 3
    assert(ab.getDouble(8) == 1.333333)  // lift 3·4/9
    graft.util.Caches.releaseAll()
  }

  test("association rules: mega-basket cap drops the basket whole") {
    import spark.implicits._
    val mega = (0 until 12).map(i => (9L, s"x$i"))
    val baskets = (Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")) ++ mega)
      .toDF("g", "it")
    val r = AssociationRules.rules(baskets, "g", "it", minSupport = 2,
      maxGroupSize = Some(10L)).collect()
    assert(r.forall(_.getLong(2) == 2L)) // survivors only in n_baskets
    assert(r.map(_.getString(0)).toSet == Set("a", "b"))
    graft.util.Caches.releaseAll()
  }
}
