package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.core.MomentState
import graft.streaming.StreamingOps

/** Round-8 part two: streaming state-store DURABILITY. The twins are
  * batch-equivalent on drained streams (Round7wSpec); this scenario
  * kills the query mid-stream and restarts it from its checkpoint —
  * the O4 continuous-sync restart semantic — proving the recovered
  * window state still merges to the exact batch profile. The sink is
  * the FILE sink (exactly-once via its commit log, restart-capable),
  * not the debug memory sink (which forbids recovery).
  */
class Round8bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("momentStateStream restarted from checkpoint still merges ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts"), col("user_id"), col("value"))
    val all = ev.as[(java.sql.Timestamp, Long, Double)].collect()
      .sortBy(_._1.getTime).toSeq
    val (firstHalf, secondHalf) = all.splitAt(all.size / 2)
    val outDir = java.nio.file.Files
      .createTempDirectory("ms_out").toString
    val cpDir = java.nio.file.Files
      .createTempDirectory("ms_cp").toString
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val states = StreamingOps.momentStateStream(
      input.toDS().toDF("ts", "user_id", "value"),
      "1 day", "0 seconds", Seq("user_id", "value"))
    def start() = states.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // phase 1: consume the first half, then KILL the query — windows
    // straddling the split are still open in the state store
    val q1 = start()
    try { input.addData(firstHalf); q1.processAllAvailable() }
    finally q1.stop()
    // phase 2: restart from the checkpoint; the recovered state must
    // absorb the second half and the flush row that closes the tail
    val q2 = start()
    try {
      input.addData(secondHalf)
      q2.processAllAvailable()
      input.addData(Seq((java.sql.Timestamp.valueOf("2044-01-01 00:00:00"),
        -1L, 0.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    val flush = java.sql.Date.valueOf("2043-12-01")
    val windows = spark.read.parquet(outDir)
      .filter(col("window_start") < lit(flush))
      .drop("window_start", "window_end")
    assert(windows.count() > 10, "expected many daily windows")
    // no double-emitted window rows across the restart (exactly-once)
    val dups = windows.groupBy(windows.columns.map(col).toSeq: _*)
      .count().filter(col("count") > 1).count()
    assert(dups == 0, "restart must not re-emit closed windows")
    val merged = MomentState.report(MomentState.merge(Seq(windows)))
      .collect().map(_.toSeq).toSeq
    val direct = MomentState.report(MomentState.state(
      ev.select("user_id", "value"))).collect().map(_.toSeq).toSeq
    assert(merged == direct,
      "recovered + post-restart states must merge to the batch profile")
  }
}
