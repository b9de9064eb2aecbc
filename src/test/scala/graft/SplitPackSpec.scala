package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pack, Split}

class SplitPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("assignSplits: deterministic, total, append-stable, roughly proportional") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Split.assignSplits(docs, weights)
    val counts = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    // append stability: a doc's split is identical when assigned in a subset
    val sub = Split.assignSplits(docs.limit(100), weights)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = a.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("leakage-safe splits: every near-dup cluster lands in exactly one split") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.minhashNearDups(docs)
    val assigned = Split.assignSplitsLeakageSafe(docs, pairs, weights)
    graft.util.Caches.releaseAll()
    val cc = Dedup.connectedComponents(pairs)
    val perCluster = assigned
      .join(cc.withColumnRenamed("doc_id", "doc_id"), Seq("doc_id"))
      .groupBy("cluster").agg(count_distinct(col("split")).as("k"))
      .agg(max("k")).collect().head.getLong(0)
    graft.util.Caches.releaseAll()
    assert(perCluster == 1L,
      "members of one near-dup cluster must share a split")
  }

  test("assignShards: budget respected up to one doc, order deterministic, no gaps") {
    val docs = Seq(
      (1L, "s", 1000L), (2L, "s", 1000L), (3L, "s", 1000L),
      (4L, "s", 1500L), (5L, "s", 200L), (6L, "s", 5000L), (7L, "s", 100L))
      .toDF("doc_id", "source", "n_tokens")
    val shards = Pack.assignShards(docs, budget = 3000L, groupCol = "source")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // cum-before: 0,1000,2000,3000,4500,4700,9700 → /3000 → 0,0,0,1,1,1,3
    assert(shards == Map(1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 3L))
    // every doc lands in exactly one shard; shard of first doc is 0
    assert(shards.values.min == 0L)
  }

  test("assignShards: shard token totals stay within budget + max doc size") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    val budget = 4096L
    val maxDoc = docs.agg(max("n_tokens")).collect().head.getLong(0)
    val over = Pack.assignShards(docs, budget, "source")
      .groupBy("source", "shard").agg(sum("n_tokens").as("t"))
      .filter(col("t") > budget + maxDoc).count()
    assert(over == 0L, s"a shard exceeded budget ($budget) + max doc ($maxDoc)")
  }

  test("assignShards: distributed prefix sum equals the global-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    val budget = 1024L
    // reference: the serial-per-group window (correct, wrong plan at scale)
    val w = Window.partitionBy("source").orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = docs.withColumn("shard",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget))
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chunked prefix sum, with a bucket count that forces many chunks
    val got = Pack.assignShards(docs, budget, "source", buckets = 13)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "bucketed prefix sum must match the global window exactly")
  }

  test("assignShards: a single-source frame still packs on >1 task") {
    // AQE coalesces the tiny test shuffle into one partition (a scale
    // artifact, not a plan property) — disable coalescing so the probe
    // sees the plan's intrinsic key space
    val prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select(col("doc_id"), lit("one").as("source"),
          graft.operators.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      // shard must stay referenced through the collect or the optimizer
      // prunes the window (cardinality-preserving) and the probe reads
      // the scan stage instead of the packing stage
      val parts = Pack.assignShards(docs, 1024L, "source", buckets = 8)
        .select(spark_partition_id().as("pid"), col("shard"))
        .collect().map(_.getInt(0)).distinct.length
      assert(parts > 1,
        "packing one group must not serialize onto a single task")
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
  }
}
