package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades (left) and quotes (right) for one symbol + one with no quotes
  private val trades = Seq(
    (1L, "A", ts("2026-01-01 10:00:05"), 100.0),
    (2L, "A", ts("2026-01-01 10:00:10"), 101.0),
    (3L, "A", ts("2026-01-01 10:00:00"), 99.0), // ties the first quote
    (4L, "B", ts("2026-01-01 10:00:07"), 50.0)) // key B has no quotes
    .toDF("trade_id", "sym", "t_ts", "t_price")

  private val quotes = Seq(
    ("A", ts("2026-01-01 10:00:00"), 10L),
    ("A", ts("2026-01-01 10:00:06"), 11L),
    ("A", ts("2026-01-01 10:00:10"), 12L))
    .toDF("sym", "q_ts", "q_id")

  private def run(joinType: String, inclusive: Boolean): Map[Long, Any] =
    AsOfJoin.asofLast(trades, quotes, Seq("sym"), "t_ts", "q_ts",
      Seq("q_id"), joinType, inclusive)
      .collect().map(r => r.getLong(0) -> r.get(4)).toMap

  test("inclusive inner: each trade gets the latest quote at-or-before it") {
    val m = run("inner", inclusive = true)
    assert(m == Map(1L -> 10L, 2L -> 12L, 3L -> 10L)) // trade 4: no match, dropped
  }

  test("strict mode excludes equal-timestamp right rows") {
    val m = run("inner", inclusive = false)
    // trade 3 (10:00:00) no longer sees the 10:00:00 quote → dropped;
    // trade 2 (10:00:10) steps back to the 10:00:06 quote
    assert(m == Map(1L -> 10L, 2L -> 11L))
  }

  test("left join keeps unmatched left rows with null payload") {
    val m = run("left", inclusive = true)
    assert(m.keySet == Set(1L, 2L, 3L, 4L))
    assert(m(4L) == null)
  }

  test("fixture scale: every quadrant matches the brute-force range-join reference") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("p_event"))

    def brute(inclusive: Boolean, left: Boolean): Set[(Long, Long, Any)] = {
      val cmp = if (inclusive) col("c.ts") >= col("p.ts") else col("c.ts") > col("p.ts")
      val joined = clicks.as("c").join(purchases.as("p"),
        col("c.user_id") === col("p.user_id") && cmp,
        if (left) "left" else "inner")
      val w = Window.partitionBy(col("c.user_id"), col("c.event_id"))
        .orderBy(col("p.ts").desc)
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("c.user_id"), col("c.event_id"), col("p.p_event"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    }
    def asof(inclusive: Boolean, left: Boolean): Set[(Long, Long, Any)] =
      AsOfJoin.asofLast(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("p_event"), if (left) "left" else "inner", inclusive)
        .select("user_id", "event_id", "p_event")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet

    for (inclusive <- Seq(true, false); left <- Seq(true, false)) {
      val b = brute(inclusive, left)
      val a = asof(inclusive, left)
      assert(a == b, s"quadrant (inclusive=$inclusive, left=$left) diverged: " +
        s"asof=${a.size} rows, brute=${b.size} rows")
      assert(a.nonEmpty, "fixture quadrant should produce rows")
    }
  }

  test("a legitimately-null payload value on a matched row survives inner mode") {
    val r = Seq(("A", ts("2026-01-01 10:00:00"), Option.empty[Long]))
      .toDF("sym", "q_ts", "q_id")
    val out = AsOfJoin.asofLast(trades.filter(col("sym") === "A"), r,
      Seq("sym"), "t_ts", "q_ts", Seq("q_id"))
    assert(out.count() == 3) // matched (struct non-null), payload field null
    assert(out.filter(col("q_id").isNull).count() == 3)
  }
}
