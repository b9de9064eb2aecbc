package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-6 part twenty-six: random negatives and dedup survivorship. */
class Round6ySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("randomNegatives: hash order, label exclusion, determinism") {
    import spark.implicits._
    val embs = Seq(
      (0L, 0), (1L, 0), (2L, 1), (3L, 1), (4L, 2), (5L, 2))
      .toDF("vec_id", "label")
      .withColumn("embedding", array(lit(1.0f)))
    val r1 = Similarity.randomNegatives(embs, Seq(0L), 3).collect()
    assert(r1.length == 3)
    assert(r1.forall(_.getInt(3) != 0))        // never the anchor label
    assert(!r1.map(_.getLong(2)).contains(1L)) // same-label excluded
    // replay: the md5 order is reproducible
    val expected = Seq(2L, 3L, 4L, 5L)
      .map(v => v -> java.security.MessageDigest.getInstance("MD5")
        .digest(s"0:$v".getBytes).map("%02x".format(_)).mkString)
      .sortBy { case (v, h) => (h, v) }(Ordering.Tuple2(
        Ordering.String.reverse, Ordering.Long))
      .take(3).map(_._1)
    assert(r1.map(_.getLong(2)).toSeq == expected)
    val r2 = Similarity.randomNegatives(embs, Seq(0L), 3).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("survivorshipMatrix: min-id winner, cross-source drain counted") {
    import spark.implicits._
    // cluster {1,2,3}: winner 1 (src A) drops 2 (B) and 3 (A);
    // cluster {10,11}: winner 10 (B) drops 11 (B)
    val docs = Seq(
      (1L, "A"), (2L, "B"), (3L, "A"), (10L, "B"), (11L, "B"), (99L, "C"))
      .toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val r = Dedup.survivorshipMatrix(docs, pairs).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("A", "A") -> 1L, ("A", "B") -> 1L, ("B", "B") -> 1L))
    graft.util.Caches.releaseAll()
  }
}
