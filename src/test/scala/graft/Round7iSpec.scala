package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, SkewReport}

/** Round-7 part four: join-size forecast + group-sequential monitor. */
class Round7iSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("joinSizeReport: census products equal the real join cardinality") {
    import spark.implicits._
    val l = Seq("a", "a", "b", "d").toDF("k")
    val r = Seq("a", "a", "a", "c").toDF("j")
    val rep = SkewReport.joinSizeReport(l, r, "k", "j").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    // only 'a' matches: 2 left x 3 right = 6 output rows
    assert(rep("a") == (2L, 3L, 6L))
    assert(rep("__all") == (2L, 3L, 6L))
    assert(!rep.contains("b") && !rep.contains("c") && !rep.contains("d"))
    // forecast ≡ the join Spark would actually run
    val actual = l.join(r, col("k") === col("j")).count()
    assert(rep("__all")._3 == actual)
  }

  test("joinSizeReport: top-N cut orders by output rows then key") {
    import spark.implicits._
    val l = (1 to 5).flatMap(k => Seq.fill(k)(s"k$k")).toDF("k")
    val r = (1 to 5).flatMap(k => Seq.fill(k)(s"k$k")).toDF("j")
    val rows = SkewReport.joinSizeReport(l, r, "k", "j", topN = 2).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("__all", "k5", "k4"))
    assert(rows(1).getLong(3) == 25L && rows(2).getLong(3) == 16L)
    // __all = 1+4+9+16+25
    assert(rows(0).getLong(3) == 55L)
  }

  test("groupSequentialZ: an overwhelming early effect stops at peek 1") {
    import spark.implicits._
    // peek 1: ctrl 0/40 vs treat 40/40 -> |z| = sqrt(80) ≈ 8.9 >= 4.048
    val p1 = (1 to 40).map(_ => (0, false, 1)) ++
      (1 to 40).map(_ => (1, true, 1))
    val rest = (2 to 4).flatMap(p => (1 to 10).map(i =>
      (i % 2, i % 2 == 1, p)))
    val units = (p1 ++ rest).toDF("arm", "success", "peek")
    val r = Experiment.groupSequentialZ(units, "peek").collect()
    assert(r.length == 4)
    assert(r(0).getBoolean(7), "peek 1 must cross the 4.048 boundary")
    r.foreach(x => assert(x.getInt(8) == 1, "first_cross_peek = 1 everywhere"))
    // cumulative accounting is monotone in n
    val ns = r.map(x => x.getLong(1) + x.getLong(3))
    assert(ns.sameElements(ns.sorted))
    // boundaries descend toward the final look
    val bs = r.map(_.getLong(6))
    assert(bs.sameElements(bs.sorted.reverse) && bs.last == 2024000L)
  }

  test("groupSequentialZ: a null effect never crosses; no stop peek") {
    import spark.implicits._
    // identical arms at every peek -> z = 0 everywhere
    val units = (1 to 4).flatMap(p => (1 to 20).map(i =>
      (i % 2, i <= 10, p))).toDF("arm", "success", "peek")
    val r = Experiment.groupSequentialZ(units, "peek").collect()
    assert(r.forall(!_.getBoolean(7)))
    assert(r.forall(_.isNullAt(8)))
  }
}
