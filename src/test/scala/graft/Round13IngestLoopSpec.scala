package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Sources
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.IngestPaths

/** Round-13 verdict task 6: compaction WIRED INTO the ingest loop.
  *
  * 1. A 10-delivery near-dup ingest with `compactEvery = Some(4)`
  *    (compaction fires inside the loop after batches 4 and 8) produces
  *    a corpus BIT-IDENTICAL to the uncompacted twin run — per (doc_id,
  *    ingest_batch) — while the band store ends with the base partition
  *    plus only the post-watermark batches, in fewer files.
  * 2. The drop law reads through the compacted base: a late delivery's
  *    near-dup of a batch-0 survivor (whose signatures now live in
  *    ingest_batch = −1) still drops.
  * 3. Round-12 ADVICE: the eager localCheckpoints inside the batch
  *    functions no longer leak — the persistent-RDD set is unchanged
  *    after a batch completes.
  */
class Round13IngestLoopSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  private def jsonl(path: String, lines: String*): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n"))
    ()
  }

  private def stamp(path: String, secondsAgo: Long): Unit = {
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(path),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - secondsAgo * 1000))
    ()
  }

  private def doc(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "en"}"""

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight under stars"

  /** 10 deliveries: per batch k one wholly-unique doc (100k+1) and one
    * near-dup of the batch-0 base variant (100k+2) that must drop from
    * batch 1 on.
    */
  private def writeDeliveries(in: String): Unit =
    (0 until 10).foreach { k =>
      jsonl(s"$in/d$k.json",
        doc(100L * k + 1, s"wholly distinct content number $k about " +
          s"subject ${('a' + k).toChar} with completely unshared phrasing " +
          s"item$k widget$k gadget$k"),
        doc(100L * k + 2, base + s" tail$k"))
      stamp(s"$in/d$k.json", 100 - k)
    }

  private def corpusPairs(paths: IngestPaths): Set[(Long, Long)] =
    StreamingIngest.corpus(spark, paths)
      // partition discovery types ingest_batch as INT on the raw read
      .select(col("doc_id"), col("ingest_batch").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def parquetFiles(dir: String): Long =
    graft.sources.FormatRoundTrip.dataFileCount(spark, dir)

  test("10 deliveries with in-loop compactEvery=4: corpus bit-identical " +
    "to the uncompacted twin, store collapsed to base + live batches") {
    graft.util.TempDirs.withTempDir("graft-r13-loop") { tmp =>
      val inA = s"$tmp/inA"; val inB = s"$tmp/inB"
      writeDeliveries(inA); writeDeliveries(inB)
      val pA = IngestPaths(s"$tmp/ca", s"$tmp/sa", s"$tmp/qa")
      val pB = IngestPaths(s"$tmp/cb", s"$tmp/sb", s"$tmp/qb")

      StreamingIngest.ingestAvailableNearDup(spark, inA, schema, pA,
        s"$tmp/ckA", maxFilesPerTrigger = 1, compactEvery = Some(4))
        .awaitTermination()
      StreamingIngest.ingestAvailableNearDup(spark, inB, schema, pB,
        s"$tmp/ckB", maxFilesPerTrigger = 1)
        .awaitTermination()

      val a = corpusPairs(pA); val b = corpusPairs(pB)
      assert(a === b, "in-loop compaction must not change any outcome")
      // expected law: batch 0 keeps both docs; batches 1-9 keep only
      // the unique doc (their base variant near-dups batch 0's)
      val expected = Set((1L, 0L), (2L, 0L)) ++
        (1 until 10).map(k => (100L * k + 1, k.toLong)).toSet
      assert(a === expected, s"drop law: $a")

      // compaction fired at batches 4 and 8: bands hold base + 8,9 only
      val bandParts = spark.table(
        StreamingIngest.storeTableName("bands", s"${pA.store}/bands"))
        .select("ingest_batch").distinct().collect()
        .map(_.getLong(0)).toSet
      assert(bandParts === Set(-1L, 8L, 9L),
        s"compacted store partitions: $bandParts")
      assert(parquetFiles(s"${pA.store}/bands") <
        parquetFiles(s"${pB.store}/bands"),
        "compaction must reduce the band store file count")

      // row multisets identical between the twins (layout differs only)
      def bandRows(p: IngestPaths) = spark.table(
        StreamingIngest.storeTableName("bands", s"${p.store}/bands"))
        .select("doc_id", "band_idx", "band_key").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
      assert(bandRows(pA) === bandRows(pB),
        "band signatures must be unaffected by compaction")

      StreamingIngest.dropStoreTables(spark, pA)
      StreamingIngest.dropStoreTables(spark, pB)
    }
  }

  test("day-zero bootstrap: the FIRST streaming delivery (batch 0) " +
    "dedups against the bootstrapped store and cannot overwrite it") {
    graft.util.TempDirs.withTempDir("graft-r13-boot") { tmp =>
      import spark.implicits._
      val in = s"$tmp/in"
      val paths = IngestPaths(s"$tmp/c", s"$tmp/s", s"$tmp/q")
      // existing corpus: one doc whose near-dups must drop from day one
      StreamingIngest.bootstrapNearDupStore(spark,
        Seq((5000L, base)).toDF("doc_id", "text"), paths)
      jsonl(s"$in/d0.json",
        doc(1L, base + " tailX"), // near-dup of the bootstrapped doc
        doc(2L, "entirely novel content about day zero bootstrap " +
          "semantics and nothing else whatsoever"))
      StreamingIngest.ingestAvailableNearDup(spark, in, schema, paths,
        s"$tmp/ck", maxFilesPerTrigger = 1).awaitTermination()
      // streaming numbers its first batch 0: the bootstrap partition
      // must be BELOW it (ingest_batch = -1), visible and untouched
      assert(corpusPairs(paths) === Set((2L, 0L)),
        "batch 0 must drop the bootstrap near-dup and keep the novel doc")
      val bootRows = spark.table(
        StreamingIngest.storeTableName("bands", s"${paths.store}/bands"))
        .filter(col("ingest_batch") === -1L)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(bootRows === Set(5000L),
        s"bootstrap partition must survive the first delivery: $bootRows")
      StreamingIngest.dropStoreTables(spark, paths)
    }
  }

  test("restart boundary: a second drain under the same checkpoint " +
    "resumes past compacted history and keeps deduping against it") {
    graft.util.TempDirs.withTempDir("graft-r13-restart") { tmp =>
      val in = s"$tmp/in"
      val paths = IngestPaths(s"$tmp/c", s"$tmp/s", s"$tmp/q")
      // phase 1: 5 deliveries, compaction fires in-loop after batch 4
      (0 until 5).foreach { k =>
        jsonl(s"$in/d$k.json",
          doc(100L * k + 1, s"unique phase one text $k alpha$k beta$k " +
            s"gamma$k"),
          doc(100L * k + 2, base + s" tail$k"))
        stamp(s"$in/d$k.json", 200 - k)
      }
      StreamingIngest.ingestAvailableNearDup(spark, in, schema, paths,
        s"$tmp/ck", maxFilesPerTrigger = 1, compactEvery = Some(4))
        .awaitTermination()
      val partsMid = spark.table(
        StreamingIngest.storeTableName("bands", s"${paths.store}/bands"))
        .select("ingest_batch").distinct().collect()
        .map(_.getLong(0)).toSet
      assert(partsMid === Set(-1L, 4L), s"phase-1 store layout: $partsMid")

      // phase 2 ("restart"): 3 more deliveries under the SAME
      // checkpoint — consumed files must not reprocess, and the new
      // batches dedup against survivors now living in the BASE partition
      (5 until 8).foreach { k =>
        jsonl(s"$in/d$k.json",
          doc(100L * k + 1, s"unique phase two text $k delta$k eps$k " +
            s"zeta$k"),
          doc(100L * k + 2, base + s" tail$k"))
        stamp(s"$in/d$k.json", 200 - k)
      }
      StreamingIngest.ingestAvailableNearDup(spark, in, schema, paths,
        s"$tmp/ck", maxFilesPerTrigger = 1, compactEvery = Some(4))
        .awaitTermination()
      val expected = Set((1L, 0L), (2L, 0L)) ++
        (1 until 8).map(k => (100L * k + 1, k.toLong)).toSet
      assert(corpusPairs(paths) === expected,
        "restart must resume at batch 5 and dedup against compacted " +
          s"history: ${corpusPairs(paths)}")
      StreamingIngest.dropStoreTables(spark, paths)
    }
  }

  test("localCheckpoint blocks release after each batch (ADVICE: no " +
    "persistent-RDD accumulation in a long-running loop)") {
    graft.util.TempDirs.withTempDir("graft-r13-ckpt") { tmp =>
      import spark.implicits._
      val paths = IngestPaths(s"$tmp/c", s"$tmp/s", s"$tmp/q")
      def batch(k: Long) = Seq(
        (100L * k + 1, s"unique payload number $k entirely fresh " +
          s"wording alpha$k beta$k"),
        (100L * k + 2, base + s" suffix$k"))
        .toDF("doc_id", "text")
        .withColumn("_corrupt_record", lit(null).cast("string"))
      val before = spark.sparkContext.getPersistentRDDs.size
      (0L until 3L).foreach { k =>
        StreamingIngest.processBatchNearDup(batch(k), k, paths)
        StreamingIngest.processBatch(batch(k + 10L), k + 100L,
          IngestPaths(s"$tmp/c2", s"$tmp/s2", s"$tmp/q2"))
      }
      val after = spark.sparkContext.getPersistentRDDs.size
      assert(after <= before,
        s"checkpoint blocks must release batch-by-batch: $before -> $after")
      StreamingIngest.dropStoreTables(spark, paths)
      StreamingIngest.dropStoreTables(spark,
        IngestPaths(s"$tmp/c2", s"$tmp/s2", s"$tmp/q2"))
    }
  }
}
