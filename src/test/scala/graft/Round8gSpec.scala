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
