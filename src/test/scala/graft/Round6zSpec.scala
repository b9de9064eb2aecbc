package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Correlate, ProfileDrift}
import graft.streaming.StreamingOps

/** Round-6 part twenty-seven: decision-stump split and the Q–Q twin. */
class Round6zSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bestSplit: perfect separator found with full label entropy gained") {
    import spark.implicits._
    val df = Seq((1.0, "p"), (1.0, "p"), (2.0, "q"), (2.0, "q"))
      .toDF("v", "lab")
    val r = Correlate.bestSplit(df, "v", col("lab") === "p")
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getLong(3) == 1000000L)            // threshold v ≤ 1
    assert(r.getLong(4) == 0L)                  // perfect: H_cond = 0
    assert(r.getLong(5) == r.getLong(2))        // ig = H(label)
    // balanced binary label: H = 2·round(0.5·ln2·1e9)
    assert(r.getLong(2) == 2L * math.rint(0.5 * math.log(2) * 1e9).toLong)
  }

  test("bestSplit: constant feature yields no candidate row") {
    import spark.implicits._
    val df = Seq((3.0, "p"), (3.0, "q")).toDF("v", "lab")
    assert(Correlate.bestSplit(df, "v", col("lab") === "p").count() == 0)
  }

  test("bestSplit: argmax ties resolve to the smallest threshold") {
    import spark.implicits._
    // alternating labels: the symmetric candidates t=1 and t=3 tie at
    // the maximum gain (each isolates one pure singleton side)
    val df = Seq((1.0, "p"), (2.0, "q"), (3.0, "p"), (4.0, "q"))
      .toDF("v", "lab")
    val r = Correlate.bestSplit(df, "v", col("lab") === "p")
      .collect().head
    assert(r.getLong(3) == 1000000L)            // smallest of the tie
  }

  test("streaming Q–Q twin: drained windowed census ≡ batch qqReport") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val census = StreamingOps.valueCensusStream(
      input.toDS().toDF("ts", "value"), "1 hour", "1 minute")
    val name = "qq_census_" + System.nanoTime()
    val q = census.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), 2.0), (ts("2024-01-01 10:15:00"), 3.0),
        (ts("2024-01-01 10:25:00"), 4.0), (ts("2024-01-01 10:35:00"), 9.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), 1.0)) // advance watermark
      q.processAllAvailable()
      val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("value")
      val got = ProfileDrift.qqFromCounts(
        spark.table(name), ProfileDrift.referenceCensus(ref, "value"))
        .filter(col("window_start") === ts("2024-01-01 10:00:00"))
        .collect().map(r => r.getInt(2) ->
          (r.getLong(5), r.getLong(6), r.getLong(7))).toMap
      val batch = ProfileDrift.qqReport(
        ref.withColumn("g", lit("w")),
        Seq(2.0, 3.0, 4.0, 9.0).toDF("value").withColumn("g", lit("w")),
        "g", "value").collect()
        .map(r => r.getInt(1) ->
          (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      assert(got == batch)
    } finally q.stop()
  }
}
