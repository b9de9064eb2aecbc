package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.core.MomentState
import graft.streaming.StreamingOps

/** Round-7 part eighteen: the streaming moment-state twin. */
class Round7wSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merged streamed window states ≡ the direct batch profile") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts"), col("user_id"), col("value"))
    val all = ev.as[(java.sql.Timestamp, Long, Double)].collect().toSeq
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val states = StreamingOps.momentStateStream(
      input.toDS().toDF("ts", "user_id", "value"),
      "1 day", "0 seconds", Seq("user_id", "value"))
    val name = "ms_stream_" + System.nanoTime()
    val q = states.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(all)
      q.processAllAvailable()
      input.addData((java.sql.Timestamp.valueOf("2044-01-01 00:00:00"),
        -1L, 0.0)) // flush the last fixture window
      q.processAllAvailable()
      val flush = java.sql.Date.valueOf("2043-12-01")
      val windows = spark.table(name)
        .filter(col("window_start") < lit(flush))
        .drop("window_start", "window_end")
      assert(windows.select("col_name").distinct().count() == 2)
      assert(windows.count() > 10, "expected many daily windows")
      val merged = MomentState.report(MomentState.merge(Seq(windows)))
        .collect().map(_.toSeq).toSeq
      val direct = MomentState.report(MomentState.state(
        ev.select("user_id", "value"))).collect().map(_.toSeq).toSeq
      assert(merged == direct,
        "windowed states must merge to the direct profile bit-for-bit")
    } finally q.stop()
  }
}
