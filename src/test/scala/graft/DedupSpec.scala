package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupConfig}

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog", "s1"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog", "s1"), // near dup of 1
    (4L, "completely different text about spark and scala here", "s1"),
    (5L, "another unrelated document mentioning data pipelines", "s2"))
    .toDF("doc_id", "text", "source")

  test("exactStats finds the exact duplicate") {
    val r = Dedup.exactStats(corpus).collect().head
    assert(r.getAs[Long]("total_docs") == 5L)
    assert(r.getAs[Long]("unique_docs") == 4L)
    assert(r.getAs[Long]("duplicate_docs") == 1L)
    assert(r.getAs[Long]("duplicate_groups") == 1L)
  }

  test("dropExactDuplicates keeps the min doc_id") {
    val kept = Dedup.dropExactDuplicates(corpus).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("jaccardPairs finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(corpus, "source", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash signatures: identical docs identical, width k, minhash-LSH recovers the near-dup pairs") {
    val sigs = Dedup.minhashSignatures(corpus, k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs.values.forall(_.length == 16))
    assert(sigs(1L) != sigs(4L))

    val found = Dedup.minhashNearDups(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 2L)))
    assert(found.contains((1L, 3L)))
  }

  test("empty/short docs produce the sentinel signature, no crash") {
    val edge = Seq((1L, "", "s"), (2L, "word", "s")).toDF("doc_id", "text", "source")
    val sigs = Dedup.minhashSignatures(edge).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).forall(_ == 1000000007L))
    assert(sigs(2L).forall(_ == 1000000007L)) // single token → no bigram
  }

  test("simhash: identical docs at Hamming 0, near-dups closer than unrelated") {
    val sh = Dedup.simhashSignatures(corpus, "source")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))

    val pairs = Dedup.simhashPairs(corpus, "source", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("production skew caps: capped output is a subset with bounded recall loss") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Dedup.minhashNearDups(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.util.Caches.releaseAll()
    val capped = Dedup.minhashNearDups(docs,
      maxBucketSize = DedupConfig.Production.maxBucketSize)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.util.Caches.releaseAll()
    // the cap only ever removes candidates — never invents pairs
    assert(capped.subsetOf(exact),
      s"capped pairs must be a subset; extras: ${(capped -- exact).take(5)}")
    // documented tradeoff: skipping hot buckets costs recall, but the loss
    // is bounded (hot buckets hold SOME real dups, not most of them)
    if (exact.nonEmpty) {
      val recall = capped.size.toDouble / exact.size
      assert(recall >= 0.5, s"capped recall $recall collapsed — cap too tight")
    }

    // same law for the shingle-frequency cap on the Jaccard path: with a
    // tiny cap the pair set can only shrink, and survivors keep scores
    val uncapped = Dedup.jaccardPairs(docs, "source", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shCapped = Dedup.jaccardPairs(docs, "source", 0.5,
      maxShingleDocs = Some(16L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shCapped.subsetOf(uncapped))
  }

  test("simhash of empty doc is 0") {
    val sh = Dedup.simhashSignatures(
      Seq((9L, "", "s")).toDF("doc_id", "text", "source"), "source")
      .collect().head.getLong(2)
    assert(sh == 0L)
  }
}
