package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Privacy, Relevance}

/** Round-8 part seven specs: RAKE keywords and the DP count release. */
class Round8gSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rakeKeywords: multi-word phrases outrank lone frequent words") {
    import spark.implicits._
    // "data quality" always appears as a phrase; "model" appears often
    // but always alone between stopwords — RAKE must rank the phrase
    // above the unigram (degree rewards phrase company)
    val docs = (1 to 10).map(i =>
      (i.toLong, "the data quality of the model is the model and data quality"))
      .toDF("doc_id", "text")
    val r = Relevance.rakeKeywords(docs, 10).collect()
      .map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r.contains("data quality"), s"$r")
    assert(r("data quality") > r("model"), s"$r")
    // phrase score = sum of word scores: deg(data)=deg(quality)=2 per
    // occurrence pattern, each word's score_w = (deg*1e6) div freq
    assert(r("model") == 1000000L, s"lone word scores deg/freq = 1: $r")
    graft.util.Caches.releaseAll()
  }

  test("rakeKeywords: islands split at stopwords, order kept") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta of gamma")).toDF("doc_id", "text")
    val r = Relevance.rakeKeywords(docs, 10).collect().map(_.getString(0))
    assert(r.contains("alpha beta") && r.contains("gamma"), r.mkString(","))
    assert(!r.contains("beta alpha") && !r.contains("beta gamma"))
    graft.util.Caches.releaseAll()
  }

  test("dpHistogram: released counts differ by bounded noise, reproducibly") {
    import spark.implicits._
    val df = (1 to 300).map(i => ("k" + (i % 3), i)).toDF("key", "x")
    val r1 = Privacy.dpHistogram(df, "key", 1000L).collect()
    val r2 = Privacy.dpHistogram(df, "key", 1000L).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq,
      "same salt => identical release")
    r1.foreach { row =>
      assert(row.getLong(1) == 100L)
      // Laplace(b=1) noise at micro scale: |noise| < 25 with
      // overwhelming margin for any hash-uniform draw we clamp
      assert(math.abs(row.getLong(2)) < 25L * 1000000L, s"$row")
      assert(row.getLong(3) == row.getLong(1) +
        row.getLong(2) / 1000000L, s"$row")
    }
    // a different salt moves the noise (release freshness lever)
    val r3 = Privacy.dpHistogram(df, "key", 1000L, salt = 7L).collect()
    assert(r1.map(_.getLong(2)).toSeq != r3.map(_.getLong(2)).toSeq,
      "salt must change the draw")
    graft.util.Caches.releaseAll()
  }

  test("dpCountsStream: each drained window ≡ the batch release " +
      "with that window's epoch salt") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = (0 until 48).map { i =>
      (ts(f"2024-01-01 ${i % 24}%02d:10:00"), "k" + (i % 3))
    }
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = graft.streaming.StreamingOps.dpCountsStream(
      input.toDS().toDF("ts", "event_type"), "1 day", "0 seconds",
      1000L)
    val name = "dp_stream_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      input.addData(Seq((ts("2044-01-01 00:00:00"), "flush")))
      q.processAllAvailable()
      val win = spark.table(name)
        .filter(col("window_start") === lit(ts("2024-01-01 00:00:00")))
      val got = win.select("key", "n", "lap_micro", "n_released")
        .collect().map(_.toSeq).sortBy(_.head.toString)
      assert(got.nonEmpty, "the fixture window must have closed")
      // the same slice through the BATCH release, salt = window epoch
      val epoch = ts("2024-01-01 00:00:00").getTime / 1000L
      val slice = rows.filter(_._1.before(ts("2024-01-02 00:00:00")))
        .toDF("ts", "event_type")
      val exp = graft.operators.Privacy
        .dpHistogram(slice, "event_type", 1000L, salt = epoch)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      assert(got.toSeq == exp.toSeq,
        s"stream window must equal the batch release: $got vs $exp")
    } finally q.stop()
  }

  test("dpHistogram: smaller epsilon means larger noise scale") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("k" + (i % 5), i)).toDF("key", "x")
    val tight = Privacy.dpHistogram(df, "key", 2000L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val loose = Privacy.dpHistogram(df, "key", 500L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // same u per key, scale b quadruples: noise is exactly 4x (up to
    // the micro rounding)
    tight.foreach { case (k, n) =>
      assert(math.abs(loose(k) - 4L * n) <= 2L, s"$k: $n vs ${loose(k)}")
    }
    graft.util.Caches.releaseAll()
  }
}
