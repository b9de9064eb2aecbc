package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Graph, ProfileDrift}

/** Round-6 part twenty-five: item recs and trimmed-mean shift. */
class Round6xSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df1(vs: Seq[Double]) = {
    import spark.implicits._
    vs.map(("g", _)).toDF("k", "value")
  }

  test("itemSimilarityTopK: popularity normalization reorders raw counts") {
    import spark.implicits._
    // item 1 co-occurs twice with ubiquitous 9 (n=4) and once with
    // niche 5 (n=1): raw counts favor 9, cosine favors 5
    // cos(1,9) = 2/√(3·4) = 0.57735; cos(1,5) = 1/√3 = 0.57735 — tie!
    // adjust: 9 appears in 5 baskets → cos(1,9) = 2/√15 = 0.516398
    val baskets = Seq(
      (1L, 1L), (1L, 9L), (2L, 1L), (2L, 9L), (3L, 1L), (3L, 5L),
      (4L, 9L), (5L, 9L), (6L, 9L)).toDF("g", "it")
    val r = Graph.itemSimilarityTopK(baskets, "g", "it", 2)
      .filter(col("item") === 1L).collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(5L, 9L)) // niche first
    assert(r.head.getDouble(5) == 0.57735)           // 1/√3
    assert(r(1).getDouble(5) == 0.516398)            // 2/√15
    assert(r.map(_.getInt(6)).toSeq == Seq(1, 2))
    graft.util.Caches.releaseAll()
  }

  test("trimmedMeanShift: outlier moves the raw mean, not the trimmed") {
    // ref 1..20; cur = same but one wild 10⁶ replaces the 20.
    // 5% trim of n=20 drops 1 from each tail: the outlier vanishes.
    val ref = df1((1 to 20).map(_.toDouble))
    val cur = df1((1 to 19).map(_.toDouble) :+ 1e6)
    val r = ProfileDrift.trimmedMeanShift(ref, cur, "k", "value")
      .collect().head
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L)  // t per side
    // ref kept 2..19 → mean 10.5; cur kept 2..19 too (1 and 1e6 cut)
    assert(r.getLong(5) == 10500000L)
    assert(r.getLong(6) == 10500000L)
    assert(r.getLong(7) == 0L)                        // robust: no shift
  }

  test("trimmedMeanShift: genuine location move survives trimming") {
    val ref = df1((1 to 20).map(_.toDouble))
    val cur = df1((1 to 20).map(_ + 3.0))
    val r = ProfileDrift.trimmedMeanShift(ref, cur, "k", "value")
      .collect().head
    assert(r.getLong(7) == 3000000L)
    // trim emptying: 1-row sides with 50-adjacent trim still behave
    val tiny = ProfileDrift.trimmedMeanShift(df1(Seq(5.0)), df1(Seq(7.0)),
      "k", "value", trimPct = 0).collect().head
    assert(tiny.getLong(7) == 2000000L)
  }
}
