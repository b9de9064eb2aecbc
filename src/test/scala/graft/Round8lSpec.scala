package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, ProfileDrift}

/** Round-8 part twelve specs: Wasserstein-1, Dunn's pairs. */
class Round8lSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("wassersteinReport: a pure location shift reads its own size") {
    import spark.implicits._
    // cur = ref + 2.5 exactly: W1 of a shift IS the shift
    val ref = (1 to 50).map(i => ("a", (i % 10).toDouble))
    val cur = ref.map { case (g, v) => (g, v + 2.5) }
    val r = ProfileDrift.wassersteinReport(ref.toDF("g", "v"),
      cur.toDF("g", "v"), "g", "v").collect()(0)
    assert(r.getLong(3) === 2500000L, r.toString)
    graft.util.Caches.releaseAll()
  }

  test("wassersteinReport: identical halves read 0, empty side NULL") {
    import spark.implicits._
    val x = (1 to 40).map(i => ("a", (i % 7).toDouble)).toDF("g", "v")
    val r = ProfileDrift.wassersteinReport(x, x, "g", "v")
      .collect()(0)
    assert(r.getLong(3) === 0L, r.toString)
    val empty = x.filter(col("v") < -1)
    val r2 = ProfileDrift.wassersteinReport(x, empty, "g", "v")
      .collect()(0)
    assert(r2.isNullAt(3), r2.toString)
    graft.util.Caches.releaseAll()
  }

  test("wassersteinReport: W1 is symmetric in its two sides") {
    import spark.implicits._
    val x = (1 to 40).map(i => ("a", (i % 9).toDouble)).toDF("g", "v")
    val y = (1 to 25).map(i => ("a", (i % 4) * 3.0)).toDF("g", "v")
    val xy = ProfileDrift.wassersteinReport(x, y, "g", "v")
      .collect()(0).getLong(3)
    val yx = ProfileDrift.wassersteinReport(y, x, "g", "v")
      .collect()(0).getLong(3)
    assert(xy === yx && xy > 0, s"$xy $yx")
    graft.util.Caches.releaseAll()
  }

  test("dunnPairs: separated group flags against both others") {
    import spark.implicits._
    val df = ((1 to 30).map(i => ("lo", (i % 5).toDouble)) ++
      (1 to 30).map(i => ("mid", (i % 5).toDouble)) ++
      (1 to 30).map(i => ("hi", 100 + (i % 5).toDouble)))
      .toDF("g", "v")
    val out = Correlate.dunnPairs(df, "g", "v").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4)))
      .toMap
    // hi is completely separated; lo/mid are identical distributions
    assert(math.abs(out(("hi", "lo"))) > 5.0, out.toString)
    assert(math.abs(out(("hi", "mid"))) > 5.0, out.toString)
    assert(math.abs(out(("lo", "mid"))) < 0.5, out.toString)
    // mean-rank sign: hi has the larger ranks
    assert(out(("hi", "lo")) > 0.0)
    graft.util.Caches.releaseAll()
  }

  test("dunnPairs: hand-computed two-group z ties out to rank sums") {
    import spark.implicits._
    // groups {1,2,3} and {4,5,6}: mean ranks 2 and 5, N=6, no ties
    // var = (6*7/12)*(1/3+1/3) = 7/3, z = -3/sqrt(7/3) = -1.963961
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Correlate.dunnPairs(df, "g", "v").collect()(0)
    assert(r.getDouble(4) === -1.963961, r.toString)
    graft.util.Caches.releaseAll()
  }
}
