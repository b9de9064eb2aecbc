package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Linkage}

/** Round-8 part one: k-core exchange budget + sorted-neighborhood
  * linkage blocking laws.
  */
class Round8aSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Total shuffle-write bytes during `body` — the exchange budget an
    * iterative operator actually pays, visible ACROSS its internal
    * checkpoint/cache-fill jobs (the final executedPlan can't see
    * inside them). Stage counts would conflate node-grain and
    * full-relation exchanges; bytes weigh them honestly.
    */
  private def shuffleBytesDuring(body: => Unit): Long = {
    val n = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) n.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    // the listener bus is async and private — a short drain pause
    // after the (synchronous) jobs is enough, and the assertion
    // carries a wide margin
    try { body; Thread.sleep(1500) }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  /** The round-7 k-core round shape — fixed-orientation, checkpoint
    * (layout lost), both endpoints re-shuffled every round — kept
    * here as the exchange-budget baseline the cached alternating form
    * must beat.
    */
  private def kCoreBothEnds(edges: org.apache.spark.sql.DataFrame,
      k: Long, rounds: Int): org.apache.spark.sql.DataFrame = {
    val directed0 = edges
      .select(col("node_a").as("src"), col("node_b").as("dst"))
      .unionByName(edges
        .select(col("node_b").as("src"), col("node_a").as("dst")))
    var live = directed0.localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = live.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("src").localCheckpoint()
      live = live.join(keep, Seq("src"))
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"))
        .localCheckpoint()
    }
    live.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("final_degree"))
  }

  private def ring(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("node_a", "node_b")
  }

  test("kCoreReport: alternating rounds beat shuffle-both-ends on bytes") {
    // force the sort-merge regime — the 100 TB case the layout design
    // targets; at broadcast scale neither form shuffles the relation
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = ring(20000)
      // warm-up so codegen/session startup doesn't pollute either side
      Graph.kCoreReport(edges, 2, 2).collect()
      graft.util.Caches.releaseAll()
      val newBytes = shuffleBytesDuring {
        Graph.kCoreReport(edges, 2, 6).collect(); ()
      }
      graft.util.Caches.releaseAll()
      val oldBytes = shuffleBytesDuring {
        kCoreBothEnds(edges, 2, 6).collect(); ()
      }
      info(s"shuffle bytes: alternating=$newBytes bothEnds=$oldBytes")
      assert(newBytes < oldBytes * 8 / 10,
        s"alternating form must shuffle materially less: " +
          s"new=$newBytes old=$oldBytes")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("kCoreReport: ring peels below k=3 and keeps a 3-core") {
    import spark.implicits._
    // two triangles sharing no edge + a pendant chain: k=2 keeps the
    // triangles, peels the chain
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L),
      (5L, 3L), (0L, 6L), (6L, 7L)).toDF("node_a", "node_b")
    val r = Graph.kCoreReport(edges, 2, 6).collect()
      .map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(Seq(0L, 1L, 2L, 3L, 4L, 5L).forall(r(_)), s"triangles survive: $r")
    assert(!r(6L) && !r(7L), s"chain peels: $r")
    graft.util.Caches.releaseAll()
  }

  test("sortedNeighborhoodPairs ⊆ blockedPairs, and the blocking binds") {
    import spark.implicits._
    val df = (0 until 200).map { i =>
      (i.toLong, i % 5, (i * 7919L) % 10000 - 1000)
    }.toDF("id", "blk", "v")
    val sn = Linkage.sortedNeighborhoodPairs(df, "blk", "v", 500L, "id")
      .select(least(col("a_id"), col("b_id")).as("x"),
        greatest(col("a_id"), col("b_id")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = Linkage.blockedPairs(df, "blk", "id")
      .select(col("a_id").as("x"), col("b_id").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sn.subsetOf(all), "SN pairs must be a subset of block pairs")
    assert(sn.size < all.size, "the neighborhood restriction must bind")
    assert(sn.nonEmpty, "some close pairs must survive")
    // no duplicate unordered pairs from the adjacent-bucket fan-out
    val raw = Linkage.sortedNeighborhoodPairs(df, "blk", "v", 500L, "id")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.length == raw.toSet.size, "pair list must be duplicate-free")
  }

  test("sortedNeighborhoodPairs: every pair within bucketWidth is kept") {
    import spark.implicits._
    val df = (0 until 80).map { i =>
      (i.toLong, 0, (i * 997L) % 3000 - 1500)
    }.toDF("id", "blk", "v")
    val sn = Linkage.sortedNeighborhoodPairs(df, "blk", "v", 400L, "id")
      .select(least(col("a_id"), col("b_id")).as("x"),
        greatest(col("a_id"), col("b_id")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(2))
    val within = (for {
      (ia, va) <- rows; (ib, vb) <- rows
      if ia < ib && math.abs(va - vb) < 400L
    } yield (ia, ib)).toSet
    assert(within.subsetOf(sn),
      s"missing close pairs: ${within.diff(sn).take(5)}")
  }
}
