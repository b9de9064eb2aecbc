package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.operators.TextOps

/** Continuous corpus ingest — the daily operation of a training-data
  * pipeline: JSONL deliveries land in a directory; each micro-batch is
  * parsed under an explicit schema with PERMISSIVE corrupt capture,
  * quarantined, exact-deduplicated against the PERSISTENT fingerprint
  * store (and within itself), and appended to the clean corpus; the
  * survivors' fingerprints extend the store. (The reference's monitors
  * observe tables that some such ingest produced; this is the
  * Spark-native producer, composed from the engine's own pieces:
  * `Sources.readValidated`'s corrupt posture, `Dedup.incrementalNewDocs`'
  * anti-join shape, the file-stream source of `ContinuousMonitor`.)
  *
  * Effectively-exactly-once WITHOUT a transactional sink: foreachBatch
  * writes two outputs (corpus + store), and a crash between them must
  * not lose or duplicate documents on replay. Both writes are
  * batch-id-partitioned overwrites (`.../ingest_batch=N` replaces
  * itself), and the dedup decision is REPLAY-STABLE because the store
  * read excludes the replaying batch's own partition
  * (`ingest_batch < N`) — so a half-written batch N re-derives the
  * same survivor set and overwrites both partitions to the same
  * state. Without the exclusion, replaying batch N would anti-join
  * against its own first-attempt fingerprints and drop every survivor
  * as a "duplicate" — the classic two-sink replay loss.
  *
  * Scale shape per batch: cost ~ |delivery| + |store fingerprints|
  * (32-byte keys, no text), never |corpus| × deliveries; the only
  * document-body shuffle is the delivery itself (fingerprint-grain
  * window, gate-safe). The store read prunes to earlier partitions;
  * long-running loops pass `compactEvery` to [[ingestAvailable]] /
  * [[ingestAvailableNearDup]] so every n-th delivery folds the
  * committed batch partitions into the base partition via
  * [[compactStores]] — same layout, fewer files (round-13: wired
  * in-loop, no longer a maintenance job the caller must remember).
  */
object StreamingIngest {

  /** Output layout: clean corpus, fingerprint store, corrupt-line
    * quarantine — each partitioned by `ingest_batch`.
    */
  final case class IngestPaths(corpus: String, store: String, quarantine: String)

  /** Run a delivery's independent sink writes concurrently from a
    * driver pool (guide §2.6, the codec-matrix pattern): each write is
    * a batch-partitioned overwrite of its own path/table, so their
    * job+commit latencies overlap instead of serializing — at delivery
    * grain those fixed costs dominate the per-batch wall (round-15).
    * Replay safety is ORDER-FREE by construction: the dedup decision
    * only reads `ingest_batch < N`, so a crash that leaves ANY subset
    * of batch N's sinks written replays to the identical final state
    * (the kill-restart specs pin the resulting hashes). Rethrows the
    * first real failure, not invokeAll's ExecutionException wrapper.
    */
  private def writeSinksInParallel(tasks: Seq[() => Unit]): Unit =
    if (tasks.size <= 1) tasks.foreach(_.apply())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
      try {
        import scala.jdk.CollectionConverters._
        val cs: Seq[java.util.concurrent.Callable[Unit]] =
          tasks.map(t => (() => t()): java.util.concurrent.Callable[Unit])
        pool.invokeAll(cs.asJava).asScala.foreach { fut =>
          try { fut.get(); () }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw Option(e.getCause).getOrElse(e)
          }
        }
        ()
      } finally { pool.shutdown(); () }
    }

  /** One delivery through parse→quarantine→dedup→append, replay-safe.
    * `batch` must carry the document columns plus `_corrupt_record`
    * (the [[graft.sources.Sources.readValidated]] posture); `batchId`
    * is the foreachBatch epoch (or the caller's delivery number).
    */
  def processBatch(batch: DataFrame, batchId: Long, paths: IngestPaths,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val cached = batch.cache()
    try {
      val corrupt = cached.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw_line"))
      if (!corrupt.isEmpty)
        corrupt.write.mode("overwrite")
          .parquet(s"${paths.quarantine}/ingest_batch=$batchId")

      val clean = cached.filter(col("_corrupt_record").isNull)
        .drop("_corrupt_record")
      val known = storeFingerprints(spark, paths.store, beforeBatch = batchId)
      val fresh = clean
        .withColumn("__fp", TextOps.fingerprint(col(textCol)))
        .join(known, col("__fp") === col("fingerprint"), "left_anti")
      // min-id survivor within the delivery, keyed by the
      // high-cardinality fingerprint (partitioned window, gate-safe).
      // EAGER localCheckpoint, not cache: the survivor lineage reads
      // the fingerprint table the INSERT OVERWRITE below replaces, and
      // a write may not read from its own target — the checkpoint cuts
      // the plan at the materialized delivery-grain rows.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__fp").orderBy(col(idCol).asc)
      val survivors = fresh.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn").localCheckpoint()
      try {
        // corpus + fingerprint-store sinks are independent overwrites
        // of disjoint targets, both reading the checkpointed survivors
        // — overlapped (round-15, same order-free replay argument as
        // writeSinksInParallel's scaladoc)
        val fpTable = ensureStoreTable(spark, "fps", paths.store,
          "fingerprint STRING", "fingerprint")
        writeSinksInParallel(Seq(
          () => survivors.drop("__fp").write.mode("overwrite")
            .parquet(s"${paths.corpus}/ingest_batch=$batchId"),
          () => insertBatchPartition(spark, fpTable, batchId,
            survivors.select(col("__fp").as("fingerprint"))
              .repartition(StoreBuckets, col("fingerprint")))))
      } finally {
        // checkpoint blocks are not cache entries: release them
        // explicitly or a long-running stream accumulates them until
        // the ContextCleaner eventually notices (round-12 ADVICE)
        graft.util.Caches.releaseCheckpoint(survivors)
      }
    } finally { cached.unpersist(); () }
  }

  /** Delivery-report schema of [[processBatchNearDup]]. */
  val NearDupReportSchema: StructType = new StructType()
    .add("ingest_batch", LongType, nullable = false)
    .add("n_in", LongType, nullable = false)
    .add("n_corrupt", LongType, nullable = false)
    .add("n_dropped_store", LongType, nullable = false)
    .add("n_dropped_within", LongType, nullable = false)
    .add("n_kept", LongType, nullable = false)

  /** NEAR-dup ingest, the fuzzy tier of [[processBatch]]: the
    * persistent store holds the SURVIVORS' MinHash band keys (blocking)
    * and hashed-bigram sets (verification) — the production layout for
    * near-dedup-on-ingest: deliveries never join document text against
    * the corpus, only band keys and ngram-hash arrays
    * ([[graft.operators.Dedup.incrementalNearDups]]' law, store-backed).
    *
    * Store layout (round 12): both stores are BUCKETED external tables
    * anchored at `paths.store/bands|ngrams` — bands CLUSTERED BY
    * (band_idx, band_key), ngrams by doc_id, [[StoreBuckets]] buckets,
    * still partitioned by `ingest_batch`. The per-delivery candidate
    * probe (`delivery bands ⋈ store bands`) and the verification join
    * (`candidates ⋈ store ngrams`) therefore read the STORE SIDE
    * WITHOUT an Exchange — only the (small) delivery side shuffles to
    * the bucket layout — so per-batch cost stays ~|delivery| +
    * one store SCAN even as the store grows, instead of re-shuffling
    * the accumulated store every delivery. Reads are also a total
    * function of the catalog (an empty table, never a missing path),
    * which removes the bands-present/ngrams-missing crash window the
    * old two-path read had: a crash between the two store writes
    * replays into two half-empty RELATIONS, not a `None.get`.
    * `idCol` must be long-valued (the store schema pins BIGINT ids —
    * the house document-id convention).
    *
    * Drop law (one-step, deterministic, no transitive closure):
    * an incoming doc is dropped iff it verifies (bigram Jaccard ≥
    * `threshold`) against (i) any earlier-batch SURVIVOR it
    * band-collides with — the store join — or (ii) any LOWER-ID doc of
    * its own batch it band-collides with, survivor or not. (ii) is
    * deliberately one-step: chains a~b, b~c retire both b and c even
    * when a≁c — conservative for training data, and exactly restatable
    * in SQL (no recursive closure), so the whole multi-delivery run
    * oracles batch-by-batch.
    *
    * Replay safety: identical to [[processBatch]] — all three writes
    * (corpus, band store, ngram store) are batch-partitioned
    * overwrites, and both store reads exclude the replaying batch's
    * own partitions, so a crash between sinks replays to the
    * identical state.
    *
    * Returns the one-row delivery report
    * (ingest_batch, n_in, n_corrupt, n_dropped_store,
    * n_dropped_within, n_kept), already materialized.
    */
  def processBatchNearDup(batch: DataFrame, batchId: Long, paths: IngestPaths,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.5,
      maxBucketSize: Option[Long] = None): DataFrame = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val cached = batch.cache()
    val scratch = scala.collection.mutable.ArrayBuffer[DataFrame](cached)
    try {
      val corrupt = cached.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw_line"))
      // ONE census job for n_corrupt AND n_in (round-14: these were two
      // separate counts — per-batch job count is the e2e loop's main
      // fixed cost at delivery grain)
      val censusRow = cached.agg(
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)),
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)))
        .collect()(0)
      val nCorrupt = if (censusRow.isNullAt(0)) 0L else censusRow.getLong(0)
      val nIn = if (censusRow.isNullAt(1)) 0L else censusRow.getLong(1)
      if (nCorrupt > 0)
        corrupt.write.mode("overwrite")
          .parquet(s"${paths.quarantine}/ingest_batch=$batchId")
      val clean = cached.filter(col("_corrupt_record").isNull)
        .drop("_corrupt_record")

      val bandsAll = Dedup.bandExplode(
        Dedup.minhashSignatures(clean, k, idCol, textCol), rowsPerBand).cache()
      // hot-bucket cap, the q34/q61 skew guard transposed to ingest: a
      // band key shared by d store docs × m delivery docs fans the
      // candidate join out d·m rows, so one boilerplate bucket can
      // dominate the whole delivery. The cap drops the delivery's OWN
      // over-full buckets (deterministic — the store side is already
      // survivor-thinned); recall for pairs that only collide in hot
      // buckets is the documented cost, exactly as in
      // [[graft.operators.Dedup.lshCandidates]] /
      // [[graft.operators.DedupConfig.Production]].
      val bandsNew = (maxBucketSize match {
        case None => bandsAll
        case Some(cap) =>
          val hot = bandsAll.groupBy("band_idx", "band_key")
            .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
            .select("band_idx", "band_key")
          bandsAll.join(broadcast(hot), Seq("band_idx", "band_key"), "left_anti")
      }).cache()
      scratch += bandsAll
      val ngramsNew = graft.util.Parallelism.ensure(clean)
        .select(col(idCol).as("doc_id"),
          graft.operators.TextOps.hashedNgrams(col(textCol)).as("hs")).cache()
      scratch += bandsNew; scratch += ngramsNew
      val jac = graft.functions.SortedLongJaccard
        .sortedLongJaccard(col("ha"), col("hb"))

      // (i) verified collision with an earlier-batch survivor. Both
      // store reads come off the bucketed tables: the band probe and
      // the ngram verification stream the store side shuffle-free
      // (bucket layout == join key), and an empty store is an empty
      // RELATION, so the first batch and the crash-between-sinks
      // replay take the same code path.
      val bandsTable = ensureStoreTable(spark, "bands",
        s"${paths.store}/bands",
        "doc_id BIGINT, band_idx INT, band_key STRING",
        "band_idx, band_key")
      val ngramsTable = ensureStoreTable(spark, "ngrams",
        s"${paths.store}/ngrams",
        "doc_id BIGINT, hs ARRAY<BIGINT>", "doc_id")
      val storeBands = spark.table(bandsTable)
        .filter(col("ingest_batch") < batchId)
        .select(col("doc_id").as("store_id"), col("band_idx"),
          col("band_key"))
      val cands = bandsNew.join(storeBands, Seq("band_idx", "band_key"))
        .select("doc_id", "store_id").distinct()
      val storeNg = spark.table(ngramsTable)
        .filter(col("ingest_batch") < batchId)
        .select(col("doc_id").as("store_id"), col("hs").as("hb"))
      val droppedStore = cands
        .join(ngramsNew.withColumnRenamed("hs", "ha"), "doc_id")
        .join(storeNg, "store_id")
        .filter(jac >= threshold)
        .select("doc_id").distinct()
      // (ii) verified collision with a lower-id doc of the same batch
      val within = bandsNew.as("a").join(bandsNew.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("doc_id"))
        .distinct()
      val droppedWithin = within
        .join(ngramsNew.select(col("doc_id").as("id_a"), col("hs").as("ha")), "id_a")
        .join(ngramsNew.select(col("doc_id"), col("hs").as("hb")), "doc_id")
        .filter(jac >= threshold)
        .select("doc_id").distinct()

      // EAGER localCheckpoint (id-grain, tiny), not cache: the dropped
      // sets' lineage reads the store tables, and the store INSERT
      // OVERWRITE below may not read from the table it overwrites —
      // the checkpoint cuts the plan at the materialized ids. ONE
      // checkpoint for both drop sets (round-14): a `from_store` tag
      // keeps the two report counts recoverable from the merged
      // relation, halving the per-batch checkpoint jobs.
      val droppedTagged = droppedStore.withColumn("__st", lit(1L))
        .unionByName(droppedWithin.withColumn("__st", lit(0L)))
        .groupBy("doc_id").agg(max(col("__st")).as("__st"))
        .localCheckpoint()
      val dropped = droppedTagged.select("doc_id")
      val survivors = clean.join(dropped,
        clean(idCol) === dropped("doc_id"), "left_anti").cache()
      scratch += droppedTagged; scratch += survivors
      val keepIds = survivors.select(col(idCol).as("doc_id"))
      // the store keeps survivors' FULL band sets (the cap thins the
      // candidate join, never the persisted signatures); static
      // partition INSERT OVERWRITE = the replay-safe batch-partitioned
      // overwrite, now through the bucketed tables. The three sinks
      // (corpus, bands, ngrams) overwrite disjoint paths and all read
      // the same cached survivor relation — overlapped from a driver
      // pool (round-15, guide §2.6; see writeSinksInParallel for the
      // order-free replay argument)
      writeSinksInParallel(Seq(
        () => survivors.write.mode("overwrite")
          .parquet(s"${paths.corpus}/ingest_batch=$batchId"),
        () => insertBatchPartition(spark, bandsTable, batchId,
          bandsAll.join(keepIds, "doc_id")
            .select(col("doc_id").cast("long"), col("band_idx").cast("int"),
              col("band_key").cast("string"))
            .repartition(StoreBuckets, col("band_idx"), col("band_key"))),
        () => insertBatchPartition(spark, ngramsTable, batchId,
          ngramsNew.join(keepIds, "doc_id")
            .select(col("doc_id").cast("long"), col("hs"))
            .repartition(StoreBuckets, col("doc_id")))))

      // one job over the checkpointed drop census for both drop counts
      // (n_in rode the corrupt census above; n_kept is the survivor
      // cache materialization the store inserts consumed anyway)
      val dropRow = droppedTagged.agg(
        sum(col("__st")), count(lit(1))).collect()(0)
      val nStore = if (dropRow.isNullAt(0)) 0L else dropRow.getLong(0)
      val nWithin =
        (if (dropRow.isNullAt(1)) 0L else dropRow.getLong(1)) - nStore
      val nKept = survivors.count()
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
          batchId, nIn, nCorrupt, nStore, nWithin, nKept)), 1),
        NearDupReportSchema)
    } finally {
      // report counts are materialized above; drop only this batch's
      // caches AND checkpoint blocks (localCheckpoint survivors are not
      // cache entries — round-12 ADVICE)
      scratch.foreach { df =>
        df.unpersist()
        graft.util.Caches.releaseCheckpoint(df)
      }
      ()
    }
  }

  /** Bucket count of the near-dup store tables. Sized like a shuffle
    * partition count for the STORE's steady-state volume, not the
    * delivery's: each delivery probe reads the store at this
    * parallelism without an Exchange.
    */
  val StoreBuckets: Int = 16

  /** BOOTSTRAP the near-dup store from an EXISTING corpus — the
    * operational day-zero of near-dedup-on-ingest: a pipeline rarely
    * starts empty; it starts against a deduplicated corpus whose
    * signatures must pre-populate the store so the very first delivery
    * dedups against history. Writes the corpus docs' full band sets and
    * hashed-bigram arrays as ONE batch partition — by default the BASE
    * partition `ingest_batch = −1`: Structured Streaming numbers its
    * FIRST micro-batch 0, whose store read filters `ingest_batch < 0`
    * and whose own insert OVERWRITES partition 0, so a bootstrap at 0
    * would be both invisible to and destroyed by the first delivery;
    * −1 is below every batch id (visible to all) and is exactly the
    * partition [[compactStores]] maintains, so compaction semantics
    * are unchanged. No dedup runs here — the corpus is presumed
    * already deduplicated, exactly like a survivor set. Also the
    * large-regime store builder for the growth bench (round-13 verdict
    * task 1: prove the probe at store ≫ delivery).
    */
  def bootstrapNearDupStore(spark: SparkSession, corpus: DataFrame,
      paths: IngestPaths, batchId: Long = -1L, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 16, rowsPerBand: Int = 4): Unit = {
    import graft.operators.Dedup
    val bands = Dedup.bandExplode(
      Dedup.minhashSignatures(corpus, k, idCol, textCol), rowsPerBand)
    val ngrams = graft.util.Parallelism.ensure(corpus)
      .select(col(idCol).as("doc_id"),
        graft.operators.TextOps.hashedNgrams(col(textCol)).as("hs"))
    val bandsTable = ensureStoreTable(spark, "bands",
      s"${paths.store}/bands",
      "doc_id BIGINT, band_idx INT, band_key STRING",
      "band_idx, band_key")
    val ngramsTable = ensureStoreTable(spark, "ngrams",
      s"${paths.store}/ngrams",
      "doc_id BIGINT, hs ARRAY<BIGINT>", "doc_id")
    insertBatchPartition(spark, bandsTable, batchId,
      bands.select(col("doc_id").cast("long"), col("band_idx").cast("int"),
        col("band_key").cast("string"))
        .repartition(StoreBuckets, col("band_idx"), col("band_key")))
    insertBatchPartition(spark, ngramsTable, batchId,
      ngrams.select(col("doc_id").cast("long"), col("hs"))
        .repartition(StoreBuckets, col("doc_id")))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Catalog name of a store table anchored at `location` — derived
    * from the location so concurrent ingest roots in one session never
    * collide, and deterministic so a RESTARTED session (fresh
    * in-memory catalog) re-binds the same files.
    */
  def storeTableName(kind: String, location: String): String =
    s"graft_ingest_${kind}_${md5hex(location).take(12)}"

  /** CREATE IF NOT EXISTS + partition recovery for a bucketed EXTERNAL
    * store table. RECOVER PARTITIONS is the restart path: a new JVM's
    * catalog starts empty, the parquet under `location` does not — the
    * recover re-registers every earlier delivery's `ingest_batch=N`
    * directory (idempotent and cheap mid-run: one listing).
    *
    * ENSURED ONCE PER CATALOG (round-13): processBatchNearDup touches
    * three tables per delivery, and the CREATE + RECOVER pair is two
    * catalog round-trips each — measurable per-batch DDL drag on the
    * e2e loop. Within one catalog lifetime the entry cannot go stale
    * (our own INSERTs register their partitions). The memo is keyed by
    * the session's SharedState (weakly, so stopped sessions GC): a
    * REBUILT SparkSession in the same JVM gets a fresh in-memory
    * catalog and therefore a fresh memo — it re-runs the CREATE +
    * RECOVER restart path instead of trusting a stale one.
    * [[dropStoreTables]] un-memoizes so short-lived staging roots
    * re-create cleanly.
    */
  private val ensured =
    new java.util.WeakHashMap[AnyRef, java.util.Set[String]]()

  private def ensuredSet(spark: SparkSession): java.util.Set[String] =
    ensured.synchronized {
      ensured.computeIfAbsent(spark.sharedState,
        _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    }

  private def ensureStoreTable(spark: SparkSession, kind: String,
      location: String, columnsDdl: String, bucketCols: String): String = {
    val name = storeTableName(kind, location)
    if (ensuredSet(spark).contains(name)) return name
    // first delivery: the external location must exist before RECOVER
    // PARTITIONS walks it
    val loc = new org.apache.hadoop.fs.Path(location)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(loc)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name ($columnsDdl,
         |  ingest_batch BIGINT)
         |USING parquet PARTITIONED BY (ingest_batch)
         |CLUSTERED BY ($bucketCols) SORTED BY ($bucketCols)
         |INTO $StoreBuckets BUCKETS
         |LOCATION '$location'""".stripMargin)
    spark.sql(s"ALTER TABLE $name RECOVER PARTITIONS")
    ensuredSet(spark).add(name)
    name
  }

  /** Replay-safe store append: STATIC partition INSERT OVERWRITE —
    * only `ingest_batch=$batchId` is replaced, whatever the session's
    * partitionOverwriteMode, and the write lands bucketed+sorted per
    * the table spec. The input is pre-partitioned to one task per
    * bucket so each insert adds exactly [[StoreBuckets]] files.
    */
  private def insertBatchPartition(spark: SparkSession, table: String,
      batchId: Long, df: DataFrame): Unit = {
    // identifier-safe for the base partition's negative id
    val view = s"__graft_insert_${table}_" +
      (if (batchId < 0) s"m${-batchId}" else batchId.toString)
    df.createOrReplaceTempView(view)
    spark.sql(s"INSERT OVERWRITE TABLE $table " +
      s"PARTITION (ingest_batch=$batchId) SELECT * FROM $view")
    spark.catalog.dropTempView(view)
    ()
  }

  /** Compact every store partition of batches in [0, beforeBatch) into
    * the single BASE partition `ingest_batch = -1` — the maintenance
    * job a long-running ingest needs: each delivery adds
    * [[StoreBuckets]] files per store, so at 10⁵ deliveries the
    * per-delivery store scan pays millions of file opens; compaction
    * collapses them to one bucketed file set while keeping layout,
    * bucketing, and read semantics IDENTICAL (every reader filters
    * `ingest_batch < N`, and −1 < N always, so base rows keep
    * participating in dedup exactly as before).
    *
    * Crash safety by IDEMPOTENCE + DUPLICATE TOLERANCE, not
    * transactions: (1) merged rows stage under a `_compact_stage` dir
    * (hidden from table reads); (2) the base partition INSERT
    * OVERWRITEs from the stage (re-runnable); (3) only then are the
    * merged batch partitions dropped and their directories deleted. A
    * crash after (2) leaves rows duplicated between base and the
    * not-yet-dropped batches — harmless by construction: every
    * consumer (fingerprint anti-join, band-collision distinct, ngram
    * verification) is duplicate-tolerant, and re-running the
    * compaction converges.
    *
    * CALLER CONTRACT: `beforeBatch` must be ≤ every batch id that
    * could still replay (i.e. ≤ the checkpoint's committed watermark);
    * replay excludes only its OWN partition, which compaction must
    * therefore never absorb.
    *
    * Returns one (store, n_partitions_merged, n_rows) row per store
    * that had anything to merge.
    */
  def compactStores(spark: SparkSession, paths: IngestPaths,
      beforeBatch: Long): DataFrame = {
    require(beforeBatch >= 0, "beforeBatch must be >= 0")
    import spark.implicits._
    val stores = Seq(
      ("fps", paths.store, "fingerprint STRING", "fingerprint"),
      ("bands", s"${paths.store}/bands",
        "doc_id BIGINT, band_idx INT, band_key STRING",
        "band_idx, band_key"),
      ("ngrams", s"${paths.store}/ngrams",
        "doc_id BIGINT, hs ARRAY<BIGINT>", "doc_id"))
    val report = stores.flatMap { case (kind, loc, ddl, bucketCols) =>
      if (!hasBatchDirs(spark, loc)) None
      else compactStoreTable(spark, kind, loc, ddl, bucketCols, beforeBatch)
    }
    report.toDF("store", "n_partitions_merged", "n_rows")
  }

  private def compactStoreTable(spark: SparkSession, kind: String,
      location: String, columnsDdl: String, bucketCols: String,
      beforeBatch: Long): Option[(String, Long, Long)] = {
    val t = ensureStoreTable(spark, kind, location, columnsDdl, bucketCols)
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect()
      .map(_.getString(0).stripPrefix("ingest_batch=").toLong)
    val mergeable = parts.filter(b => b >= 0 && b < beforeBatch)
    val hasBase = parts.contains(-1L)
    if (mergeable.isEmpty) return None
    val dataCols = spark.table(t).columns.filter(_ != "ingest_batch")
    val stage = s"$location/_compact_stage"
    // full-row distinct: all three stores are SET-semantics relations,
    // so the merge also absorbs any crash-window duplicates (rows left
    // in both base and a not-yet-dropped batch by an earlier aborted
    // compaction)
    val merged = spark.table(t)
      .filter(col("ingest_batch") < beforeBatch)
      .select(dataCols.map(col): _*).distinct()
    merged.write.mode("overwrite").parquet(stage)
    val bucketColList = bucketCols.split(",").map(c => col(c.trim))
    insertBatchPartition(spark, t, -1L,
      spark.read.parquet(stage)
        .repartition(StoreBuckets, bucketColList: _*))
    val nRows = spark.table(t).filter(col("ingest_batch") === -1L).count()
    val fs = new org.apache.hadoop.fs.Path(location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    mergeable.foreach { b =>
      spark.sql(s"ALTER TABLE $t DROP IF EXISTS PARTITION (ingest_batch=$b)")
      fs.delete(new org.apache.hadoop.fs.Path(s"$location/ingest_batch=$b"),
        true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    Some((kind, mergeable.length.toLong + (if (hasBase) 1L else 0L), nRows))
  }

  /** Drop the near-dup store tables' catalog entries (external — files
    * under `paths.store` are untouched). Call when tearing down a
    * staging-root ingest so short-lived roots don't leave dangling
    * catalog entries.
    */
  def dropStoreTables(spark: SparkSession, paths: IngestPaths): Unit = {
    Seq("fps" -> paths.store,
      "bands" -> s"${paths.store}/bands",
      "ngrams" -> s"${paths.store}/ngrams").foreach { case (kind, loc) =>
      val name = storeTableName(kind, loc)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      ensuredSet(spark).remove(name)
    }
    ()
  }

  /** Distinct fingerprints of every batch strictly before `beforeBatch`
    * (partition-pruned), or an empty relation when the store doesn't
    * exist yet. `Long.MaxValue` reads the whole store.
    *
    * Table-backed since round 12: the store is an external table
    * CLUSTERED BY (fingerprint), so both the distinct and the
    * per-delivery anti-join consume the store WITHOUT an Exchange (the
    * bucket layout already satisfies their clustering). The
    * no-files-yet case stays a pure read (empty relation, no table or
    * directory created as a side effect).
    */
  /** Existence = direct `ingest_batch=` children: a recursive parquet
    * read at the store root would trip partition discovery when the
    * near-dup subtrees (`bands/`, `ngrams/`) share the root.
    */
  private def hasBatchDirs(spark: SparkSession, loc: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.startsWith("ingest_batch="))
  }

  def storeFingerprints(spark: SparkSession, store: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    if (!hasBatchDirs(spark, store))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new StructType().add("fingerprint", StringType))
    else {
      val t = ensureStoreTable(spark, "fps", store,
        "fingerprint STRING", "fingerprint")
      spark.table(t).filter(col("ingest_batch") < beforeBatch)
        .select("fingerprint").distinct()
    }

  /** The ingested corpus (document columns + `ingest_batch`). */
  def corpus(spark: SparkSession, paths: IngestPaths): DataFrame =
    readPartitioned(spark, paths.corpus).getOrElse(
      sys.error(s"no corpus at ${paths.corpus}"))

  /** Quarantined raw lines (+ `ingest_batch`), empty if none ever. */
  def quarantined(spark: SparkSession, paths: IngestPaths): Option[DataFrame] =
    readPartitioned(spark, paths.quarantine)

  /** basePath read so `ingest_batch=` directories surface as a column;
    * None when the root has no parquet yet (first delivery).
    */
  private def readPartitioned(spark: SparkSession, root: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        val seg = f.getPath.getName
        found = seg.endsWith(".parquet") && !seg.startsWith("_") && !seg.startsWith(".")
      }
      found
    }
    if (hasData)
      Some(spark.read.option("basePath", root).parquet(root))
    else None
  }

  /** Drain every pending delivery file through [[processBatch]] with
    * AvailableNow semantics: the checkpoint tracks consumed source
    * files, so a restart resumes at the first unprocessed (or
    * uncommitted — then replayed, safely) batch. `maxFilesPerTrigger`
    * bounds a micro-batch to a delivery's files.
    */
  def ingestAvailable(spark: SparkSession, inPath: String, schema: StructType,
      paths: IngestPaths, checkpoint: String,
      maxFilesPerTrigger: Int = 1,
      compactEvery: Option[Int] = None): StreamingQuery =
    validatedFileStream(spark, inPath, schema, maxFilesPerTrigger)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, paths)
        maybeCompact(b.sparkSession, paths, id, compactEvery)
      }
      .start()

  /** [[ingestAvailable]]'s fuzzy sibling: drains pending deliveries
    * through [[processBatchNearDup]] under the same checkpoint/replay
    * contract. `maxBucketSize` carries the production hot-bucket cap;
    * `compactEvery = Some(n)` runs [[compactStores]] after every n-th
    * delivery (the maintenance loop the round-12 scaladoc promised).
    */
  def ingestAvailableNearDup(spark: SparkSession, inPath: String,
      schema: StructType, paths: IngestPaths, checkpoint: String,
      maxFilesPerTrigger: Int = 1, threshold: Double = 0.5,
      maxBucketSize: Option[Long] = None,
      compactEvery: Option[Int] = None): StreamingQuery =
    validatedFileStream(spark, inPath, schema, maxFilesPerTrigger)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatchNearDup(b, id, paths, threshold = threshold,
          maxBucketSize = maxBucketSize)
        maybeCompact(b.sparkSession, paths, id, compactEvery)
      }
      .start()

  /** IN-LOOP compaction (round-13 verdict task 6): after every
    * `every`-th delivery, merge the fully-committed batch partitions
    * into the base partition. The watermark is the CURRENT batch id —
    * batch `id` itself is not yet committed when foreachBatch runs (the
    * checkpoint commits after we return), so it can still replay and
    * must keep its own partition; every batch strictly below `id` IS
    * committed (AvailableNow processes batches in order), satisfying
    * [[compactStores]]' caller contract. A crash DURING compaction
    * replays batch `id`, which re-runs processBatch* (replay-safe) and,
    * on the next trigger boundary, re-runs the compaction — which is
    * idempotent and duplicate-tolerant by construction.
    */
  private def maybeCompact(spark: SparkSession, paths: IngestPaths,
      batchId: Long, every: Option[Int]): Unit =
    every.foreach { n =>
      require(n >= 1, "compactEvery must be >= 1")
      if (batchId > 0 && batchId % n == 0) {
        compactStores(spark, paths, beforeBatch = batchId).collect()
        ()
      }
    }

  private def validatedFileStream(spark: SparkSession, inPath: String,
      schema: StructType, maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(inPath)
}
