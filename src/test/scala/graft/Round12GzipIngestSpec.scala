package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.IngestPaths

/** Round-12: COMPRESSED deliveries through the ingest loop — the codec
  * axis (q282) meeting the continuous-ingest surface (q280/q281). Real
  * feeds arrive as `.json.gz`; Spark's file sources decompress by
  * extension, so the whole quarantine/dedup/replay machinery must work
  * unchanged on gzipped JSONL — including a malformed line INSIDE a
  * gzipped member (the corrupt capture runs post-decompression) and a
  * mixed plain+gzip directory, which is what a feed migration looks
  * like mid-cutover.
  */
class Round12GzipIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  private def gz(path: String, lines: String*): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
  }

  private def plain(path: String, lines: String*): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path), lines.mkString("\n") + "\n")
    ()
  }

  private def doc(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "en"}"""

  private def readValidated(in: String) =
    graft.sources.Sources.readValidated(spark, in, schema, "json")

  test("gzipped JSONL deliveries: dedup across batches, malformed line " +
    "inside the gzip member quarantines, replay is row-identical") {
    graft.util.TempDirs.withTempDir("graft-gz-ingest") { dir =>
      val paths = IngestPaths(s"$dir/c", s"$dir/s", s"$dir/q")
      gz(s"$dir/in0/d0.json.gz",
        doc(1, "alpha beta"), doc(2, "gamma delta"),
        """{"doc_id": 99, "text": unquoted}""")
      StreamingIngest.processBatch(readValidated(s"$dir/in0"), 0L, paths)
      // batch 1 arrives PLAIN (mid-cutover mix) with a cross-batch dup
      plain(s"$dir/in1/d1.json",
        doc(3, "alpha beta"), doc(4, "epsilon zeta"))
      StreamingIngest.processBatch(readValidated(s"$dir/in1"), 1L, paths)
      // replay batch 1 (two-sink crash recovery) on the same input
      StreamingIngest.processBatch(readValidated(s"$dir/in1"), 1L, paths)

      val ids = StreamingIngest.corpus(spark, paths)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L),
        "doc 3 dups doc 1 across the gzip boundary; malformed never lands")
      val quarantined = StreamingIngest.quarantined(spark, paths)
        .map(_.select("raw_line").collect().map(_.getString(0)).toSeq)
        .getOrElse(Nil)
      assert(quarantined === Seq("""{"doc_id": 99, "text": unquoted}"""),
        "the malformed line inside the gzip member quarantines verbatim")
    }
  }

  test("gzipped deliveries through the NEAR-dup tier: store drop law " +
    "holds across compressed batches") {
    graft.util.TempDirs.withTempDir("graft-gz-neardup") { dir =>
      val paths = IngestPaths(s"$dir/c", s"$dir/s", s"$dir/q")
      val base = "the quick brown fox jumps over the lazy dog and then " +
        "runs far away into the deep dark forest tonight"
      gz(s"$dir/in0/d0.json.gz", doc(1, base))
      val r0 = StreamingIngest.processBatchNearDup(
        readValidated(s"$dir/in0"), 0L, paths).collect().head
      assert(r0.getLong(5) === 1L)
      gz(s"$dir/in1/d1.json.gz",
        doc(10, base.replace("tonight", "today")),
        doc(11, "wholly different content with no shared bigrams at all " +
          "describing compressed delivery handling in the ingest loop"))
      val r1 = StreamingIngest.processBatchNearDup(
        readValidated(s"$dir/in1"), 1L, paths).collect().head
      assert(r1.getLong(3) === 1L && r1.getLong(5) === 1L,
        s"near-dup of the gzipped batch-0 survivor drops: $r1")
      StreamingIngest.dropStoreTables(spark, paths)
    }
  }
}
