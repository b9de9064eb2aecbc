package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextOps, TimeSeries}

/** Round-6 part sixteen: inter-arrival quartiles, hard negatives,
  * char entropy.
  */
class Round6oSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("interArrivalReport: hand-computed quartiles, one user") {
    import spark.implicits._
    // gaps 10 s, 20 s, 70 s → n=3: p25 = rank 1 = 10 s, p50 = rank 2,
    // p75 = rank ⌈9/4⌉ = 3 = 70 s, p90 = rank 3; mean = 100/3 s floored
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "click"),
      (2L, ts("2024-01-01 00:00:10"), 7L, "click"),
      (3L, ts("2024-01-01 00:00:30"), 7L, "click"),
      (4L, ts("2024-01-01 00:01:40"), 7L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = TimeSeries.interArrivalReport(ev, "event_type").collect().head
    assert(r.getLong(1) == 3L)                    // n_gaps
    assert(r.getLong(2) == 33333333L)             // mean_us floor
    assert(r.getLong(3) == 10000000L)             // p25
    assert(r.getLong(4) == 20000000L)             // p50
    assert(r.getLong(5) == 70000000L)             // p75
    assert(r.getLong(6) == 70000000L)             // p90
  }

  test("interArrivalReport: gaps never span users or event types") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:05:00"), 2L, "a"),  // other user — no gap
      (3L, ts("2024-01-01 00:09:00"), 1L, "b"))  // other type — no gap
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(TimeSeries.interArrivalReport(ev, "event_type").count() == 0)
  }

  test("hardNegatives: same-label candidates (and self) never rank") {
    import spark.implicits._
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f), 0),   // same label as anchor — excluded
      (2L, Seq(1.0f, 0.01f), 1),  // near-identical, other label → rank 1
      (3L, Seq(0.0f, 1.0f), 1))   // orthogonal, other label → rank 2
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(embs, Seq(0L), 2).collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 3L))
    assert(r.map(_.getInt(5)).toSeq == Seq(1, 2))
    assert(r.head.getInt(1) == 0 && r.head.getInt(3) == 1) // labels carried
    assert(r.head.getDouble(4) > 0.99 && r(1).getDouble(4) == 0.0)
  }

  test("charEntropyNano: hand-computed nano-nat cells") {
    import spark.implicits._
    val df = Seq("aabb", "abcd", "aaaa", "a", "")
      .toDF("text")
      .withColumn("e", TextOps.charEntropyNano(col("text")))
      .select(col("text"), col("e.n_runs"), col("e.ent_nano"))
    val m = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    // aabb: 2 cells of round(0.5·ln2·1e9) = 346573590
    assert(m("aabb") == (2L, 693147180L))
    // abcd: 4 cells of round(0.25·ln4·1e9) = 346573590
    assert(m("abcd") == (4L, 1386294360L))
    assert(m("aaaa") == (1L, 0L))   // constant text → zero entropy
    assert(m("a") == (1L, 0L))
    assert(m("") == (0L, 0L))       // guard: no descending sequence
  }

  test("charEntropyNano: fold over sorted runs ≡ census formulation") {
    import spark.implicits._
    // interleaved chars — the sort must regroup them into census cells
    val df = Seq("abab", "xyzzyx").toDF("text")
      .withColumn("e", TextOps.charEntropyNano(col("text")))
    val got = df.select(col("text"), col("e.ent_nano")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def census(sft: String): Long =
      sft.groupBy(identity).values.map { run =>
        val p = run.length.toDouble / sft.length
        math.rint(-p * math.log(p) * 1e9).toLong
      }.sum
    assert(got("abab") == census("abab"))
    assert(got("xyzzyx") == census("xyzzyx"))
  }
}
