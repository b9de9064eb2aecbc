package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Experiment, Relevance}

/** Round-8 part ten specs: isotonic calibration, DSIR importance,
  * Cochran–Armitage.
  */
class Round8jSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("isotonicCalibration: pools the violating bins, PAV by hand") {
    import spark.implicits._
    // 3 bins (scores 0/1/2, nBins=3): rates 0.2, 0.6, 0.4 -> the last
    // two pool to 0.5; counts chosen so every division is exact
    val rows =
      (1 to 10).map(i => (0L, i <= 2)) ++
        (1 to 10).map(i => (1L, i <= 6)) ++
        (1 to 10).map(i => (2L, i <= 4))
    val df = rows.toDF("s", "y")
    val out = Evaluation.isotonicCalibration(df, "s", col("y"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((0L, 200000L, 200000L),
      (1L, 600000L, 500000L), (2L, 400000L, 500000L)),
      out.mkString(","))
    graft.util.Caches.releaseAll()
  }

  test("isotonicCalibration: monotone input is returned unchanged") {
    import spark.implicits._
    val rows =
      (1 to 10).map(i => (0L, i <= 1)) ++
        (1 to 10).map(i => (5L, i <= 5)) ++
        (1 to 10).map(i => (9L, i <= 9))
    val out = Evaluation.isotonicCalibration(rows.toDF("s", "y"),
      "s", col("y"), 10).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(out.forall { case (raw, iso) => raw == iso },
      out.mkString(","))
    // and the fit is non-decreasing
    assert(out.map(_._2).toSeq === out.map(_._2).sorted.toSeq)
    graft.util.Caches.releaseAll()
  }

  test("importanceWeights: target-like documents rank first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "zebra zebra zebra stripes", true),
      (2L, "zebra stripes common words", true),
      (3L, "common words only here", false),
      (4L, "zebra zebra stripes stripes", false),
      (5L, "totally unrelated filler text", false))
      .toDF("doc_id", "text", "is_tgt")
    val out = Relevance.importanceWeights(docs, col("is_tgt"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 4 shares the target's vocabulary without being in it —
    // it must outrank the non-target-looking docs 3 and 5
    val byId = out.map(t => t._1 -> t._3).toMap
    assert(byId(4L) > byId(3L) && byId(4L) > byId(5L),
      out.mkString(","))
    assert(out.map(_._1).take(1).head != 5L)
    // token counts are the plain whitespace-word counts here
    assert(out.find(_._1 == 1L).get._2 === 4L)
    graft.util.Caches.releaseAll()
  }

  test("cochranArmitage: linear trend flags, flat is exactly 0") {
    import spark.implicits._
    val trend = (1 to 5).flatMap(t =>
      (1 to 20).map(i => (t.toLong, i <= 4 * t - 2)))
    val z1 = Experiment.cochranArmitage(trend.toDF("t", "y"), "t",
      col("y")).collect()(0)
    assert(z1.getDouble(3) > 5.0, z1.toString)
    val flat = (1 to 5).flatMap(t =>
      (1 to 20).map(i => (t.toLong, i <= 10)))
    val z0 = Experiment.cochranArmitage(flat.toDF("t", "y"), "t",
      col("y")).collect()(0)
    assert(z0.getDouble(3) === 0.0, z0.toString)
    // a single group has no trend axis -> NULL
    val one = (1 to 20).map(i => (1L, i <= 7))
    val zn = Experiment.cochranArmitage(one.toDF("t", "y"), "t",
      col("y")).collect()(0)
    assert(zn.isNullAt(3), zn.toString)
  }
}
