package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.IngestPaths

/** Round-12: the near-dup ingest store is a BUCKETED external table —
  * the r11 verdict's task 4. Checks, on a real two-delivery run:
  *
  *   1. drop semantics across the store boundary survive the layout
  *      change (a batch-1 near-dup of a batch-0 survivor drops as
  *      n_dropped_store), and a batch replay is bit-stable;
  *   2. the candidate probe's physical plan reads the store side
  *      WITHOUT an Exchange (bucket layout == join key) while the
  *      delivery side carries the only shuffle — the whole point of
  *      bucketing: per-delivery cost never re-shuffles the
  *      accumulated store;
  *   3. the ngram verification join likewise streams the ngram store
  *      shuffle-free on its doc_id bucketing.
  */
class Round12IngestStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def doc(id: Long, text: String): (Long, String) = (id, text)

  private def asBatch(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("_corrupt_record", lit(null).cast("string"))
  }

  private val base = "the quick brown fox jumps over the lazy dog " +
    "and then runs far away into the deep dark forest tonight"

  test("store-backed near-dup drop law and replay stability on the " +
    "bucketed table layout") {
    graft.util.TempDirs.withTempDir("graft-r12-store") { tmp =>
      val paths = IngestPaths(s"$tmp/corpus", s"$tmp/store", s"$tmp/quarantine")
      val b0 = asBatch(Seq(
        doc(1L, base),
        doc(2L, "completely unrelated content about spark bucketing " +
          "and sorted store layouts for incremental ingest pipelines")))
      val r0 = StreamingIngest.processBatchNearDup(b0, 0L, paths)
        .collect().head
      assert(r0.getLong(5) === 2L, s"batch 0 keeps both docs: $r0")
      // batch 1: doc 10 near-dups doc 1 (one word changed), doc 11 fresh
      val b1 = asBatch(Seq(
        doc(10L, base.replace("tonight", "today")),
        doc(11L, "a third totally distinct document mentioning neither " +
          "foxes nor bucket layouts just to survive the filter stage")))
      val r1 = StreamingIngest.processBatchNearDup(b1, 1L, paths)
        .collect().head
      assert(r1.getLong(3) === 1L, s"batch 1 store-drop expected: $r1")
      assert(r1.getLong(5) === 1L, s"batch 1 keeps one doc: $r1")
      // replay batch 1 (crash-recovery): identical report, store stable
      val r1b = StreamingIngest.processBatchNearDup(b1, 1L, paths)
        .collect().head
      assert(r1.toSeq === r1b.toSeq, "replay must be bit-stable")
      val bandsTable = StreamingIngest
        .storeTableName("bands", s"$tmp/store/bands")
      val perBatch = spark.table(bandsTable)
        .groupBy("ingest_batch").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perBatch.keySet === Set(0L, 1L),
        s"one store partition per delivery: $perBatch")
      // survivors only: batch 1 persisted exactly one doc's bands
      val docsB1 = spark.table(bandsTable)
        .filter(col("ingest_batch") === 1L)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(docsB1 === Set(11L), s"batch 1 persists only survivors: $docsB1")
      StreamingIngest.dropStoreTables(spark, paths)
    }
  }

  /** No Exchange anywhere above the store table's scan: collect every
    * shuffle in the (initial) physical plan and assert none of their
    * subtrees reach a file scan rooted under `storeDirFragment`.
    * With `requireBucketed` the scan must additionally BE bucketed —
    * the shuffle-free-by-layout regime (sort-merge path); without it
    * the planner may legitimately stream the store through a
    * BroadcastHashJoin and skip bucketed reading entirely.
    */
  private def assertStoreSideShuffleFree(df: DataFrame,
      storeDirFragment: String, requireBucketed: Boolean): Unit = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def scansUnder(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => f
    }
    val plan = unwrap(df.queryExecution.executedPlan)
    val storeScans = scansUnder(plan).filter(f =>
      f.relation.location.rootPaths.exists(_.toString.contains(storeDirFragment)))
    assert(storeScans.nonEmpty, s"no store scan in plan:\n$plan")
    if (requireBucketed)
      assert(storeScans.forall(_.bucketedScan),
        s"store scan not bucketed:\n$plan")
    val shuffles = plan.collect {
      case e: ShuffleExchangeLike
          if scansUnder(e.asInstanceOf[SparkPlan]).exists(f =>
            f.relation.location.rootPaths.exists(
              _.toString.contains(storeDirFragment))) =>
        e.nodeName
    }
    assert(shuffles.isEmpty,
      s"store side under $storeDirFragment must not shuffle, " +
        s"found $shuffles in:\n$plan")
  }

  test("EXACT-tier fingerprint store: anti-join reads the store side " +
    "without an Exchange (distinct included)") {
    graft.util.TempDirs.withTempDir("graft-r12-fps") { tmp =>
      val paths = IngestPaths(s"$tmp/corpus", s"$tmp/store", s"$tmp/quarantine")
      StreamingIngest.processBatch(asBatch(
        (1L to 30L).map(i => doc(i, s"alpha document $i"))), 0L, paths)
      StreamingIngest.processBatch(asBatch(
        (100L to 120L).map(i => doc(i, s"beta document $i"))), 1L, paths)
      // cross-batch dup law survives the table layout
      StreamingIngest.processBatch(asBatch(Seq(
        doc(500L, "alpha document 1"), doc(501L, "novel gamma text"))),
        2L, paths)
      val ids = StreamingIngest.corpus(spark, paths)
        .filter(col("ingest_batch") === 2L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(501L), s"dup of batch-0 doc must drop: $ids")

      import spark.implicits._
      val known = StreamingIngest.storeFingerprints(spark, paths.store, 3L)
      def anti = Seq((900L, "zz")).toDF("doc_id", "__fp")
        .join(known, col("__fp") === col("fingerprint"), "left_anti")
      assertStoreSideShuffleFree(anti, "store", requireBucketed = false)
      val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
      val saved = spark.conf.get(thresholdKey)
      try {
        spark.conf.set(thresholdKey, "-1")
        assertStoreSideShuffleFree(anti, "store", requireBucketed = true)
      } finally spark.conf.set(thresholdKey, saved)
      StreamingIngest.dropStoreTables(spark, paths)
    }
  }

  test("candidate probe and ngram verification read the store side " +
    "without an Exchange") {
    graft.util.TempDirs.withTempDir("graft-r12-plan") { tmp =>
      val paths = IngestPaths(s"$tmp/corpus", s"$tmp/store", s"$tmp/quarantine")
      val b0 = asBatch((1L to 40L).map(i =>
        doc(i, s"document number $i with shared vocabulary " + base)))
      StreamingIngest.processBatchNearDup(b0, 0L, paths)
      val b1 = asBatch((100L to 120L).map(i =>
        doc(i, s"fresh delivery $i probing the persistent store " + base)))
      StreamingIngest.processBatchNearDup(b1, 1L, paths)

      import graft.operators.Dedup
      val bandsNew = Dedup.bandExplode(
        Dedup.minhashSignatures(asBatch(Seq(doc(500L, base + " anew"))), 16))
      val bandsTable = StreamingIngest
        .storeTableName("bands", s"$tmp/store/bands")
      val storeBands = spark.table(bandsTable)
        .filter(col("ingest_batch") < 2L)
        .select(col("doc_id").as("store_id"), col("band_idx"), col("band_key"))
      // the operator's candidate probe up to the join (its distinct()
      // shuffles JOIN OUTPUT, which is expected and not under test)
      def probe = bandsNew
        .join(storeBands, Seq("band_idx", "band_key"))
        .select("doc_id", "store_id")
      val ngramsTable = StreamingIngest
        .storeTableName("ngrams", s"$tmp/store/ngrams")
      val storeNg = spark.table(ngramsTable)
        .filter(col("ingest_batch") < 2L)
        .select(col("doc_id").as("store_id"), col("hs").as("hb"))
      import spark.implicits._
      def verify = Seq((500L, 1L), (500L, 2L)).toDF("doc_id", "store_id")
        .join(storeNg, "store_id")

      // regime 1 (default): small delivery broadcasts, store STREAMS
      assertStoreSideShuffleFree(probe, "store/bands",
        requireBucketed = false)
      assertStoreSideShuffleFree(verify, "store/ngrams",
        requireBucketed = false)
      // regime 2 (large delivery — broadcast off): sort-merge path,
      // where the BUCKET layout is what saves the store-side Exchange
      val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
      val saved = spark.conf.get(thresholdKey)
      try {
        spark.conf.set(thresholdKey, "-1")
        assertStoreSideShuffleFree(probe, "store/bands",
          requireBucketed = true)
        assertStoreSideShuffleFree(verify, "store/ngrams",
          requireBucketed = true)
      } finally spark.conf.set(thresholdKey, saved)
      StreamingIngest.dropStoreTables(spark, paths)
    }
  }
}
