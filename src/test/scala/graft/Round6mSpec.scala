package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Graph, ProfileDrift}
import graft.streaming.StreamingOps

/** Round-6 part fourteen: weighted PageRank and the streaming KS twin. */
class Round6mSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pageRankMicro weighted: mass splits proportionally to weights") {
    import spark.implicits._
    // 1—2 (w=3), 2—3 (w=1): strengths 3, 4, 1.
    // round 1: in(1) = (10⁶·3)div4 = 750000, in(2) = 10⁶ + 10⁶ = 2·10⁶,
    // in(3) = (10⁶·1)div4 = 250000 → ranks 787500 / 1850000 / 362500.
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L))
      .toDF("node_a", "node_b", "w")
    val r = Graph.pageRankMicro(edges, 1, "node_a", "node_b", Some("w"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == (3L, 787500L))
    assert(r(2L) == (4L, 1850000L))
    assert(r(3L) == (1L, 362500L))
    graft.util.Caches.releaseAll()
  }

  test("pageRankMicro: unit weights reproduce the unweighted ranks") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("node_a", "node_b")
    val plain = Graph.pageRankMicro(edges, 2).collect().map(_.toSeq)
    graft.util.Caches.releaseAll()
    val weighted = Graph.pageRankMicro(
      edges.withColumn("w", lit(1L)), 2, "node_a", "node_b", Some("w"))
      .collect().map(_.toSeq)
    assert(plain.toSeq == weighted.toSeq)
    graft.util.Caches.releaseAll()
  }

  test("streaming KS twin: drained windowed census ≡ batch ksReport") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    case class Ev(ts: java.sql.Timestamp, value: Double)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val census = StreamingOps.valueCensusStream(
      input.toDS().toDF("ts", "value"), "1 hour", "1 minute")
    val name = "ks_census_" + System.nanoTime()
    val q = census.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        (ts("2024-01-01 10:10:00"), 2.0), (ts("2024-01-01 10:20:00"), 3.0),
        (ts("2024-01-01 10:30:00"), 4.0),
        (ts("2024-01-01 11:10:00"), 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), 9.0)) // advance watermark
      q.processAllAvailable()
      val ref = Seq(1.0, 2.0, 3.0).toDF("value")
      val got = ProfileDrift.ksFromCounts(
        spark.table(name), ProfileDrift.referenceCensus(ref, "value"))
        .collect()
        .map(r => r.getTimestamp(0).toString ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toMap
      // window 10:00: cur {2,3,4} vs ref {1,2,3} → d=3, ks=1/3
      assert(got("2024-01-01 10:00:00.0") == (3L, 3L, 3L, 0.333333))
      // window 11:00: cur {1} → d = |1·1 − 1·3| = 2, ks = 2/3
      assert(got("2024-01-01 11:00:00.0") == (3L, 1L, 2L, 0.666667))
      // cross-check the first window against the batch operator
      val batch = ProfileDrift.ksReport(
        ref.withColumn("g", lit("w")),
        Seq(2.0, 3.0, 4.0).toDF("value").withColumn("g", lit("w")),
        "g", "value").collect().head
      assert(batch.getLong(3) == 3L && batch.getDouble(5) == 0.333333)
    } finally q.stop()
  }
}
