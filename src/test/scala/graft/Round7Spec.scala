package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Experiment

/** Round-6 part twenty-eight: two-proportion z with segments. */
class Round7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("proportionZ: hand-computed z and the pooled __all row") {
    import spark.implicits._
    // ctrl 1/4 convert, treat 3/4 convert
    val units = Seq(
      (0, false, "s"), (0, false, "s"), (0, false, "s"), (0, true, "s"),
      (1, true, "s"), (1, true, "s"), (1, true, "s"), (1, false, "s"))
      .toDF("arm", "success", "segment")
    val r = Experiment.proportionZ(units).collect()
      .map(x => x.getString(0) -> x).toMap
    val all = r("__all")
    assert(all.getLong(1) == 4L && all.getLong(2) == 1L)
    assert(all.getLong(5) == 250000L && all.getLong(6) == 750000L)
    assert(all.getLong(7) == 500000L)
    // z = (0.75−0.25)/√(0.5·0.5·(¼+¼)) = 0.5/√0.125 = 1.414214
    assert(all.getDouble(8) == 1.414214)
    // single segment ≡ pooled numbers
    assert(r("s").getDouble(8) == all.getDouble(8))
  }

  test("proportionZ: Simpson flip is visible across segment rows") {
    import spark.implicits._
    // within both segments treat converts BETTER, but ctrl is
    // concentrated in the easy segment → pooled diff favors ctrl
    val easyCtrl = (1 to 80).map(_ => (0, true, "easy")) ++
      (1 to 20).map(_ => (0, false, "easy"))
    val easyTreat = (1 to 9).map(_ => (1, true, "easy")) :+ (1, false, "easy")
    val hardCtrl = (1 to 10).map(i => (0, i <= 1, "hard"))
    val hardTreat = (1 to 100).map(i => (1, i <= 20, "hard"))
    val units = (easyCtrl ++ easyTreat ++ hardCtrl ++ hardTreat)
      .toDF("arm", "success", "segment")
    val r = Experiment.proportionZ(units).collect()
      .map(x => x.getString(0) -> x.getLong(7)).toMap
    assert(r("easy") > 0 && r("hard") > 0)   // treat wins inside each
    assert(r("__all") < 0)                   // yet loses pooled
  }

  test("proportionZ: a segment missing one arm reports 0 counts, NULL z") {
    import spark.implicits._
    // segment 'solo' has only treatment units — counts must be ZERO
    // (not NULL, the old max-pivot behavior) and rate/z NULL
    val units = Seq(
      (0, true, "both"), (0, false, "both"), (1, true, "both"),
      (1, true, "solo"), (1, false, "solo"))
      .toDF("arm", "success", "segment")
    val r = Experiment.proportionZ(units).collect()
      .map(x => x.getString(0) -> x).toMap
    val solo = r("solo")
    assert(solo.getLong(1) == 0L && solo.getLong(2) == 0L)
    assert(solo.getLong(3) == 2L && solo.getLong(4) == 1L)
    assert(solo.isNullAt(5) && solo.isNullAt(8)) // no ctrl rate, no z
    assert(r("__all").getLong(1) == 2L && r("__all").getLong(3) == 3L)
  }
}
