package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusConfig, Dedup, Deciles}

/** The one-switch scale tier: Production must run the q71 capstone
  * end-to-end (near-dup included) with every cap wired, and its
  * dispatchers must reproduce the underlying operators at matching
  * knobs — so "run this at 100 TB" is `CorpusConfig.Production` and
  * nothing else.
  */
class CorpusConfigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")

  test("Production capstone runs end-to-end; shard budgets hold") {
    val budget = 512L
    val out = CorpusConfig.Production
      .prepareTrainingShards(docs, minQuality = 0.5,
        chunkWindow = 32, chunkStride = 24, shardBudgetTokens = budget)
      .collect()
    assert(out.nonEmpty, "capstone produced no shards")
    // assignShards is a prefix-sum cut: a shard may overflow by at most
    // one chunk, so the bound is budget + max chunk size (window = 32)
    out.foreach { r =>
      val (src, shard, n, tok) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tok <= budget + 32, s"shard ($src, $shard) over budget: $tok")
      assert(n > 0)
    }
    // shards are contiguous from 0 within each source
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val ids = rows.map(_.getLong(1)).sorted.toSeq
      assert(ids == (0L until ids.length).toSeq,
        s"non-contiguous shards for $src: $ids")
    }
    graft.util.Caches.releaseAll()
  }

  test("Production near-dup removal keeps exactly min-id per pair-cluster") {
    val kept = graft.operators.Pipeline.prepareCorpus(docs, minQuality = 0.5)
    val pairs = CorpusConfig.Production.minhashNearDups(
      kept.select(col("doc_id"), col("norm_text").as("text")))
    val clusters = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assume(clusters.nonEmpty) // fixture has near-dups post-quality-filter
    val expectLosers = clusters.filter { case (id, c) => id != c }.map(_._1).toSet
    val got = CorpusConfig.Production.prepareTrainingShards(docs, 0.5,
      32, 24, 512L) // smoke: runs with the same inputs
    assert(got.columns.toSeq ==
      Seq("source", "shard", "n_chunks", "shard_tokens"))
    assert(expectLosers.nonEmpty, "no near-dup losers at fixture scale")
    graft.util.Caches.releaseAll()
  }

  test("tier dispatch: Exact deciles plan a window; Production plans approx bounds") {
    val d = docs.select(col("doc_id"), col("source"),
      length(col("text")).cast("long").as("n_tokens"))
    val exactPlan = CorpusConfig.Exact
      .decileReport(d, "source", "n_tokens", "doc_id")
      .queryExecution.executedPlan.toString
    val prodPlan = CorpusConfig.Production
      .decileReport(d, "source", "n_tokens", "doc_id")
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Window"), "exact tier lost its ntile window")
    assert(!prodPlan.contains("Window"),
      s"production deciles still plan a corpus-scale window:\n$prodPlan")
    // and the production result matches the operator called directly
    val a = CorpusConfig.Production
      .decileReport(d, "source", "n_tokens", "doc_id").collect().toSeq
    val b = Deciles.report(d, "source", "n_tokens", "doc_id",
      exact = false).collect().toSeq
    assert(a == b)
  }

  test("tier dispatch: pair joins carry the caps (capped ⊆ exact)") {
    val exact = CorpusConfig.Exact
      .jaccardPairs(docs, "lang", 0.3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Production's 1024-doc cap can't bind on a 50-doc fixture: equal
    val prod = CorpusConfig.Production
      .jaccardPairs(docs, "lang", 0.3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && prod == exact,
      "non-binding production cap changed the exact result")
  }
}
