package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-8 part fifteen specs: ANN recall report. */
class Round8oSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("annRecallReport: recall against itself is 1, LSH is bounded") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val out = Similarity.annRecallReport(emb, Seq(0L, 1L, 2L), 5)
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getLong(1) === 5L, r.toString)            // exact k
      assert(r.getLong(3) <= r.getLong(1), r.toString)   // hits ≤ k
      assert(r.getLong(3) <= r.getLong(2), r.toString)   // hits ≤ lsh
      val ppm = r.getLong(4)
      assert(ppm >= 0L && ppm <= 1000000L, r.toString)
      assert(ppm === r.getLong(3) * 1000000L / 5L)
    }
    graft.util.Caches.releaseAll()
  }

  test("annRecallReport: identical rankings give recall exactly 1") {
    // degenerate check via the operator's own exact arm: joining the
    // brute-force set with itself must give n_hits = n_exact
    val emb = Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val bf = Similarity.bruteForceTopK(emb, Seq(0L), 5)
      .select("query_id", "vec_id")
    val self = bf.join(bf, Seq("query_id", "vec_id"))
      .groupBy("query_id").count().collect()(0)
    assert(self.getLong(1) === 5L)
    graft.util.Caches.releaseAll()
  }
}
