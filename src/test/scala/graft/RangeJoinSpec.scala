package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val points = Seq(
    ("u1", 5L), ("u1", 10L), ("u1", 19L), ("u1", 20L), ("u1", 35L),
    ("u2", 10L)) // same value, different key
    .toDF("k", "v")

  private val intervals = Seq(
    ("u1", "a", 10L, 20L),  // [10, 20): hits 10, 19; NOT 20 (exclusive) or 5
    ("u1", "b", 0L, 40L),   // spans many bins: hits all u1 points
    ("u1", "c", 25L, 25L),  // empty interval: hits nothing
    ("u2", "d", 0L, 15L))   // other key: hits only u2's 10
    .toDF("k", "name", "lo", "hi")

  private def run(binWidth: Long): Set[(String, Long, String)] =
    RangeJoin.binnedRangeJoin(points, intervals, Seq("k"), "v", "lo", "hi", binWidth)
      .select("k", "v", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

  private val expected = Set(
    ("u1", 10L, "a"), ("u1", 19L, "a"),
    ("u1", 5L, "b"), ("u1", 10L, "b"), ("u1", 19L, "b"),
    ("u1", 20L, "b"), ("u1", 35L, "b"),
    ("u2", 10L, "d"))

  test("lo inclusive, hi exclusive, keyed; empty intervals match nothing") {
    assert(run(binWidth = 10) == expected)
  }

  test("result is bin-width independent (no duplicate pairs across bins)") {
    // an interval spanning N bins must still produce each pair exactly once
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val r = RangeJoin.binnedRangeJoin(points, intervals, Seq("k"),
        "v", "lo", "hi", w)
        .select("k", "v", "name")
        .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2)))
      assert(r.length == r.toSet.size, s"duplicates at binWidth=$w")
      assert(r.toSet == expected, s"wrong pairs at binWidth=$w")
    }
  }

  test("adaptive width (median interval width) yields the identical result") {
    val auto = RangeJoin.binnedRangeJoin(points, intervals, Seq("k"), "v", "lo", "hi")
      .select("k", "v", "name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(auto == expected)
  }

  test("adaptive width survives degenerate inputs (empty / zero-width intervals)") {
    val none = intervals.filter(col("name") === "zzz") // empty relation
    assert(RangeJoin.binnedRangeJoin(points, none, Seq("k"), "v", "lo", "hi")
      .count() == 0)
    val zero = Seq(("u1", "z", 10L, 10L)).toDF("k", "name", "lo", "hi")
    assert(RangeJoin.binnedRangeJoin(points, zero, Seq("k"), "v", "lo", "hi")
      .count() == 0) // median width 0 clamps to 1, empty interval matches nothing
  }

  test("plans as an equi-join on (key, bin), not a nested-loop product") {
    val p = RangeJoin.binnedRangeJoin(points, intervals, Seq("k"),
      "v", "lo", "hi", 10).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to a product join:\n$p")
  }
}
