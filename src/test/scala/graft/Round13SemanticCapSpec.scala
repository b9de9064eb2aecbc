package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-13 (verdict optional task 8): the hot-bucket cap on
  * [[Similarity.semanticDedupLsh]] — buckets past `maxBucketSize` skip
  * the pair stage (all their rows keep themselves; the q61 recall
  * trade), while uncapped behavior is bit-identical to before (q70a's
  * oracle hash is pinned at three scales by CORRECTNESS).
  */
class Round13SemanticCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // two tight clusters that land in LSH buckets and near-dup within
  private def embeddings = {
    import spark.implicits._
    val dim = 64
    def vec(seed: Int, eps: Double): Array[Float] =
      Array.tabulate(dim)(j =>
        (math.sin(seed * 31 + j) + (if (j == seed % dim) eps else 0.0)).toFloat)
    (0 until 12).map { i =>
      val cluster = i % 2
      (i.toLong, s"l$cluster", vec(cluster + 1, 0.001 * i))
    }.toDF("vec_id", "label", "embedding")
  }

  test("uncapped vs binding cap: capped run keeps every row of the " +
    "over-full buckets; uncapped clusters collapse") {
    val unc = Similarity.semanticDedupLsh(embeddings, 0.45, nPlanes = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(unc.size < 12,
      s"fixture must actually cluster somewhere: kept $unc")
    // cap of 1: every bucket with >1 row skips pairing -> all 12 kept
    val capped = Similarity.semanticDedupLsh(embeddings, 0.45,
      nPlanes = 3, maxBucketSize = Some(1L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(capped.size === 12,
      s"cap=1 must keep everything (no pair stage runs): $capped")
    // a cap that binds nowhere is a no-op: identical keep set
    val loose = Similarity.semanticDedupLsh(embeddings, 0.45,
      nPlanes = 3, maxBucketSize = Some(1000L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(loose === unc, "non-binding cap must not change outcomes")
    graft.util.Caches.releaseAll()
  }
}
