package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

import graft.streaming.StreamingOps

case class StreamEv(doc_id: Long, fp: String, ts: Timestamp, user_id: Long, value: Double)

class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup keeps first occurrence within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEv]
    val out = StreamingOps.dropDuplicatesStream(
      input.toDS().toDF(), Seq("fp"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        StreamEv(1, "aaa", ts("2024-01-01 00:00:00"), 1, 1.0),
        StreamEv(2, "aaa", ts("2024-01-01 00:00:30"), 1, 1.0), // dup in-batch
        StreamEv(3, "bbb", ts("2024-01-01 00:01:00"), 1, 1.0))
      q.processAllAvailable()
      input.addData(
        StreamEv(4, "aaa", ts("2024-01-01 00:02:00"), 1, 1.0), // dup cross-batch
        StreamEv(5, "ccc", ts("2024-01-01 00:03:00"), 1, 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 3L, 5L))
    } finally q.stop()
  }

  test("streaming session windows merge near events and emit closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEv]
    val out = StreamingOps.sessionStream(
      input.toDS().toDF(), gap = "5 minutes", watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("session_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        StreamEv(1, "x", ts("2024-01-01 00:00:00"), 7, 1.5),
        StreamEv(2, "x", ts("2024-01-01 00:03:00"), 7, 2.5), // merges (gap 3m < 5m)
        StreamEv(3, "x", ts("2024-01-01 00:20:00"), 7, 4.0)) // separate session
      q.processAllAvailable()
      // advance watermark far enough to close both sessions
      input.addData(StreamEv(9, "y", ts("2024-01-01 02:00:00"), 8, 0.0))
      q.processAllAvailable()
      val rows = spark.table("session_stream")
        .filter($"user_id" === 7).orderBy("session_start")
        .collect().map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      assert(rows.toSeq == Seq((2L, 4.0), (1L, 4.0)))
    } finally q.stop()
  }
}
