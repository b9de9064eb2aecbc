package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** Round-7 part ten: session path census. */
class Round7oSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("topPaths: hand-built journeys, truncation, share accounting") {
    import spark.implicits._
    // user 1: one session view>click>buy>extra (truncated at 3);
    // user 2: two sessions (gap > 1h): view>click | view
    // user 3: view>click>buy
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "click"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "buy"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "extra"),
      (2L, 5L, ts("2024-01-01 09:00:00"), "view"),
      (2L, 6L, ts("2024-01-01 09:05:00"), "click"),
      (2L, 7L, ts("2024-01-01 12:00:00"), "view"),
      (3L, 8L, ts("2024-01-01 08:00:00"), "view"),
      (3L, 9L, ts("2024-01-01 08:01:00"), "click"),
      (3L, 10L, ts("2024-01-01 08:02:00"), "buy"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = Sessionize.topPaths(ev, gapSeconds = 3600, pathLen = 3)
      .collect().map(x => x.getString(1) ->
        (x.getInt(0), x.getLong(2), x.getLong(3))).toMap
    // 4 sessions total: view>click>buy ×2, view>click ×1, view ×1
    assert(r("view>click>buy") == (1, 2L, 500000L))
    assert(r("view") == (2, 1L, 250000L)) // n-tie: lexicographic path
    assert(r("view>click") == (3, 1L, 250000L))
    assert(r.size == 3)
    // equal-ts determinism: ties break by event_id inside the window
    val tie = Seq(
      (9L, 2L, ts("2024-01-01 10:00:00"), "b"),
      (9L, 1L, ts("2024-01-01 10:00:00"), "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val p = Sessionize.topPaths(tie, 3600, 2).collect().head.getString(1)
    assert(p == "a>b")
  }
}
