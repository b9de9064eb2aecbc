package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{CorpusStats, EventFunnel, ProfileDrift}
import graft.streaming.StreamingOps

/** Round-6 part seventeen: conversion latency, distinctive terms, and
  * the streaming rank-sum twin.
  */
class Round6pSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("conversionLatency: cohort-day quartiles, non-convert binds") {
    import spark.implicits._
    val ev = Seq(
      // user 1: A at 00:00, B at 00:10 → dt = 600 s
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:10:00"), 1L, "b"),
      // user 2: B BEFORE first A only → started, not converted
      (3L, ts("2024-01-01 01:00:00"), 2L, "b"),
      (4L, ts("2024-01-01 02:00:00"), 2L, "a"),
      // user 3: A next day, B 30 s later → second cohort day
      (5L, ts("2024-01-02 00:00:00"), 3L, "a"),
      (6L, ts("2024-01-02 00:00:30"), 3L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = EventFunnel.conversionLatency(ev,
      col("event_type") === "a", col("event_type") === "b")
      .collect()
    assert(r.length == 2)
    val d1 = r(0)
    assert(d1.getDate(0).toString == "2024-01-01")
    assert(d1.getLong(1) == 2L && d1.getLong(2) == 1L) // started, converted
    assert(d1.getLong(3) == 500000L)                   // conv_ppm = 1e6 div 2
    assert(d1.getLong(4) == 600000000L)                // mean 600 s in µs
    assert(d1.getLong(5) == 600000000L && d1.getLong(8) == 600000000L)
    val d2 = r(1)
    assert(d2.getLong(1) == 1L && d2.getLong(2) == 1L)
    assert(d2.getLong(6) == 30000000L)                 // p50 = 30 s
    graft.util.Caches.releaseAll()
  }

  test("conversionLatency: zero-conversion day keeps NULL quartiles") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = EventFunnel.conversionLatency(ev,
      col("event_type") === "a", col("event_type") === "b")
      .collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(8))
    graft.util.Caches.releaseAll()
  }

  test("distinctiveTerms: over-used token rises, zero cell surfaces negative") {
    import spark.implicits._
    // group X uses 'foo' heavily; group Y never does (zero cell);
    // 'base' is common ground
    val docs = Seq(
      ("x", "foo foo foo foo base base"),
      ("x", "foo foo base base"),
      ("y", "base base base base bar bar"),
      ("y", "base base bar bar"))
      .toDF("source", "text")
    val r = CorpusStats.distinctiveTerms(docs, "source",
      vocabSize = 10, alpha0 = 4L, topK = 3).collect()
    val xTop = r.filter(_.getString(0) == "x").head
    assert(xTop.getString(1) == "foo")       // rank 1 for its heavy user
    assert(xTop.getDouble(5) > 0)
    // foo appears in Y's grid as a ZERO cell with negative z
    val yFoo = r.filter(x => x.getString(0) == "y" && x.getString(1) == "foo")
    if (yFoo.nonEmpty) assert(yFoo.head.getLong(2) == 0L &&
      yFoo.head.getDouble(5) < 0)
    val yTop = r.filter(_.getString(0) == "y").head
    assert(yTop.getString(1) == "bar" && yTop.getDouble(5) > 0)
    graft.util.Caches.releaseAll()
  }

  test("distinctiveTerms: symmetric corpora give mirror-image z") {
    import spark.implicits._
    val docs = Seq(("p", "aa bb"), ("q", "bb cc"))
      .toDF("source", "text")
    val r = CorpusStats.distinctiveTerms(docs, "source",
      vocabSize = 3, alpha0 = 2L, topK = 3).collect()
    def z(g: String, w: String) =
      r.find(x => x.getString(0) == g && x.getString(1) == w).get.getDouble(5)
    // aa: p-exclusive; cc: q-exclusive — same counts, so mirrored z
    assert(z("p", "aa") == z("q", "cc"))
    assert(z("p", "cc") == z("q", "aa"))
    assert(z("p", "bb") == z("q", "bb"))     // shared token, equal usage
    graft.util.Caches.releaseAll()
  }

  test("streaming rank-sum twin: drained windowed census ≡ batch report") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val census = StreamingOps.valueCensusStream(
      input.toDS().toDF("ts", "value"), "1 hour", "1 minute")
    val name = "rs_census_" + System.nanoTime()
    val q = census.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        (ts("2024-01-01 10:10:00"), 2.0), (ts("2024-01-01 10:20:00"), 3.0),
        (ts("2024-01-01 10:30:00"), 4.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), 9.0)) // advance watermark
      q.processAllAvailable()
      val ref = Seq(1.0, 2.0, 3.0).toDF("value")
      val got = ProfileDrift.rankSumFromCounts(
        spark.table(name), ProfileDrift.referenceCensus(ref, "value"))
        .filter(col("window_start") === ts("2024-01-01 10:00:00"))
        .collect().head
      val batch = ProfileDrift.rankSumReport(
        ref.withColumn("g", lit("w")),
        Seq(2.0, 3.0, 4.0).toDF("value").withColumn("g", lit("w")),
        "g", "value").collect().head
      // (n_ref, n_cur, u2, tie3, r_rb, z) identical stream vs batch
      assert((got.getLong(2), got.getLong(3), got.getLong(4),
        got.getLong(5), got.getDouble(6), got.getDouble(7)) ==
        (batch.getLong(1), batch.getLong(2), batch.getLong(3),
          batch.getLong(4), batch.getDouble(5), batch.getDouble(6)))
    } finally q.stop()
  }
}
