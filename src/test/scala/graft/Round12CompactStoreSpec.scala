package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.IngestPaths

/** Round-12: store COMPACTION for long-running ingest — batches below
  * the replay watermark merge into the base partition (ingest_batch =
  * −1) with layout, bucketing, and dedup semantics unchanged.
  *
  *   1. row multisets identical pre/post compaction, file count drops;
  *   2. the dedup law is UNCHANGED: post-compaction deliveries still
  *      drop against survivors that now live in the base partition
  *      (−1 < N for every later batch N);
  *   3. crash-window duplicate tolerance: rows present in BOTH base
  *      and a not-yet-dropped batch partition (the state a crash
  *      between the base insert and the partition drops leaves) do not
  *      change any delivery's outcome, and re-running the compaction
  *      converges;
  *   4. compaction is repeat-safe (second run with nothing new merges
  *      nothing / changes nothing).
  */
class Round12CompactStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def asBatch(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("_corrupt_record", lit(null).cast("string"))
  }

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"

  private def bandRows(tmp: String) =
    spark.table(StreamingIngest.storeTableName("bands", s"$tmp/store/bands"))

  private def parquetFiles(dir: String): Long =
    graft.sources.FormatRoundTrip.dataFileCount(spark, dir)

  test("near-dup store compaction: identical rows, fewer files, drop " +
    "law preserved, repeat-safe") {
    graft.util.TempDirs.withTempDir("graft-r12-compact") { tmp =>
      val paths = IngestPaths(s"$tmp/corpus", s"$tmp/store", s"$tmp/quarantine")
      (0 until 4).foreach { k =>
        StreamingIngest.processBatchNearDup(asBatch(Seq(
          (100L * k + 1, s"wholly distinct content number $k about " +
            s"topic ${('a' + k).toChar} with no shared phrasing"),
          (100L * k + 2, base + s" variant $k"))), k.toLong, paths)
      }
      val before = bandRows(tmp)
        .select("doc_id", "band_idx", "band_key")
        .collect().map(_.toSeq).sortBy(_.toString)
      val filesBefore = parquetFiles(s"$tmp/store/bands")

      // merge batches 0..2; batch 3 stays replayable
      val rep = StreamingIngest.compactStores(spark, paths, beforeBatch = 3L)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      assert(rep.keySet === Set("bands", "ngrams"),
        s"near-dup run compacts bands+ngrams only: $rep")
      assert(rep("bands")._1 === 3L, s"three band partitions merged: $rep")

      val after = bandRows(tmp)
        .select("doc_id", "band_idx", "band_key")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(after.toSeq === before.toSeq,
        "compaction must not change the band row multiset")
      val partsAfter = bandRows(tmp).select("ingest_batch").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(partsAfter === Set(-1L, 3L), s"base + live batch: $partsAfter")
      assert(parquetFiles(s"$tmp/store/bands") < filesBefore,
        "compaction must reduce the file count")

      // the drop law reads through the base partition: a near-dup of a
      // batch-0 survivor (now in base) still drops
      val r4 = StreamingIngest.processBatchNearDup(asBatch(Seq(
        (900L, base + " variant 0 almost"),
        (901L, "entirely novel text mentioning compaction and nothing " +
          "else from any earlier delivery whatsoever"))), 4L, paths)
        .collect().head
      assert(r4.getLong(3) >= 1L && r4.getLong(5) <= 1L,
        s"base-partition survivor must still block near-dups: $r4")

      // repeat-safe: nothing below the watermark left to merge
      val rep2 = StreamingIngest.compactStores(spark, paths, 3L)
      assert(rep2.filter(col("store") === "bands").count() === 0L)
      StreamingIngest.dropStoreTables(spark, paths)
    }
  }

  test("exact-tier compaction + crash-window duplicates: outcomes " +
    "unchanged, re-run converges") {
    graft.util.TempDirs.withTempDir("graft-r12-compact-fps") { tmp =>
      val paths = IngestPaths(s"$tmp/corpus", s"$tmp/store", s"$tmp/quarantine")
      StreamingIngest.processBatch(asBatch(Seq(
        (1L, "alpha beta"), (2L, "gamma delta"))), 0L, paths)
      StreamingIngest.processBatch(asBatch(Seq(
        (3L, "epsilon zeta"))), 1L, paths)
      val fpsBefore = StreamingIngest.storeFingerprints(spark, paths.store)
        .collect().map(_.getString(0)).sorted.toSeq

      StreamingIngest.compactStores(spark, paths, beforeBatch = 2L)
      val fpsAfter = StreamingIngest.storeFingerprints(spark, paths.store)
        .collect().map(_.getString(0)).sorted.toSeq
      assert(fpsAfter === fpsBefore, "fingerprint set unchanged")

      // crash-window state: base rows ALSO present in a stale batch
      // partition (as if the post-insert drops never ran) — duplicate
      // fingerprints must not change any later delivery's outcome
      val t = StreamingIngest.storeTableName("fps", paths.store)
      spark.table(t).filter(col("ingest_batch") === -1L)
        .select("fingerprint").limit(1)
        .createOrReplaceTempView("__r12_dup_fp")
      spark.sql(s"INSERT INTO $t PARTITION (ingest_batch=0) " +
        "SELECT * FROM __r12_dup_fp")
      StreamingIngest.processBatch(asBatch(Seq(
        (10L, "alpha beta"), (11L, "fresh eta theta"))), 2L, paths)
      val ids = StreamingIngest.corpus(spark, paths)
        .filter(col("ingest_batch") === 2L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(11L),
        s"duplicated store fingerprints must not change outcomes: $ids")

      // re-running the compaction absorbs the stale partition and its
      // duplicate: raw row count == distinct count afterwards
      StreamingIngest.compactStores(spark, paths, beforeBatch = 2L)
      val raw = spark.table(t).count()
      val dis = spark.table(t).select("fingerprint").distinct().count()
      assert(raw === dis,
        s"compaction re-run converges to a duplicate-free store ($raw/$dis)")
      assert(StreamingIngest.storeFingerprints(spark, paths.store, 2L)
        .collect().map(_.getString(0)).sorted.toSeq === fpsBefore,
        "pre-watermark fingerprint set unchanged by the re-run")
      val parts = spark.table(t).select("ingest_batch").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(parts === Set(-1L, 2L), s"stale partition absorbed: $parts")
      StreamingIngest.dropStoreTables(spark, paths)
    }
  }
}
