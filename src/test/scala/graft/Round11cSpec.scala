package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Sources
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.IngestPaths

/** Continuous corpus ingest (q280): the pieces the oracle can't grade —
  * the streaming wrapper's checkpoint resume (consumed files are never
  * reprocessed across restarts), replay stability at the corpus-row
  * level, the store-exclusion law that prevents the two-sink replay
  * loss, and verbatim quarantine capture.
  */
class Round11cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ingest-spec").toFile.getAbsolutePath

  private def rm(root: String): Unit = graft.util.TempDirs.rm(root)

  private def jsonl(path: String, lines: String*): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n"))
    ()
  }

  /** The file stream source orders by modification time with an
    * unspecified tie-break; deliveries written in the same millisecond
    * need explicit stamps for a deterministic batch order.
    */
  private def stamp(path: String, secondsAgo: Long): Unit = {
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(path),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - secondsAgo * 1000))
    ()
  }

  private def doc(id: Long, text: String, lang: String = "en"): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "$lang"}"""

  private def corpusIds(paths: IngestPaths): Set[Long] =
    StreamingIngest.corpus(spark, paths)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("streaming drain + restart: consumed files never reprocess, new " +
    "files dedup against the store") {
    val dir = tmp()
    try {
      val in = s"$dir/in"
      val paths = IngestPaths(s"$dir/c", s"$dir/s", s"$dir/q")
      jsonl(s"$in/d0.json", doc(1, "alpha beta"), doc(2, "gamma delta"))
      jsonl(s"$in/d1.json", doc(3, "alpha beta"), doc(4, "epsilon zeta"))
      stamp(s"$in/d0.json", 10); stamp(s"$in/d1.json", 5)
      val q1 = StreamingIngest.ingestAvailable(spark, in, schema, paths,
        s"$dir/ckpt", maxFilesPerTrigger = 1)
      q1.awaitTermination()
      // doc 3 duplicates doc 1's token set across deliveries
      assert(corpusIds(paths) === Set(1L, 2L, 4L))

      jsonl(s"$in/d2.json", doc(5, "gamma delta"), doc(6, "eta theta"))
      val q2 = StreamingIngest.ingestAvailable(spark, in, schema, paths,
        s"$dir/ckpt", maxFilesPerTrigger = 1)
      q2.awaitTermination()
      // restart with the same checkpoint: d0/d1 not reprocessed (their
      // batch partitions would otherwise be overwritten empty-of-new or
      // duplicated under fresh ids), doc 5 deduped against the store
      assert(corpusIds(paths) === Set(1L, 2L, 4L, 6L))
      val batches = StreamingIngest.corpus(spark, paths)
        .select("ingest_batch").distinct().count()
      assert(batches === 3L) // d0, d1, d2 — one partition each
    } finally rm(dir)
  }

  test("replay of a batch is row-identical (two-sink crash recovery)") {
    val dir = tmp()
    try {
      val in = s"$dir/in"
      val paths = IngestPaths(s"$dir/c", s"$dir/s", s"$dir/q")
      jsonl(s"$in/d0.json", doc(1, "alpha beta"), doc(2, "gamma delta"))
      jsonl(s"$in/d1.json", doc(3, "alpha beta"), doc(4, "iota kappa"),
        doc(5, "iota kappa"))
      def batch(file: String) = Sources.readValidated(spark, s"$in/$file", schema, "json")
      StreamingIngest.processBatch(batch("d0.json"), 0, paths)
      StreamingIngest.processBatch(batch("d1.json"), 1, paths)
      val before = StreamingIngest.corpus(spark, paths)
        .collect().map(_.toString).sorted.toSeq
      // replay batch 1 — same input, same id, store already contains
      // batch 1's fingerprints; the before-batch exclusion must make
      // the survivor set identical instead of empty
      StreamingIngest.processBatch(batch("d1.json"), 1, paths)
      val after = StreamingIngest.corpus(spark, paths)
        .collect().map(_.toString).sorted.toSeq
      assert(after === before)
      assert(corpusIds(paths) === Set(1L, 2L, 4L)) // 3 dup-of-1, 5 dup-of-4 in-batch
      // store stays one row per corpus doc
      assert(StreamingIngest.storeFingerprints(spark, paths.store).count() === 3L)
    } finally rm(dir)
  }

  test("storeFingerprints(beforeBatch) excludes the replaying batch's " +
    "own partition — the law that prevents replay loss") {
    val dir = tmp()
    try {
      val in = s"$dir/in"
      val paths = IngestPaths(s"$dir/c", s"$dir/s", s"$dir/q")
      jsonl(s"$in/d0.json", doc(1, "alpha beta"))
      jsonl(s"$in/d1.json", doc(2, "gamma delta"))
      def batch(file: String) = Sources.readValidated(spark, s"$in/$file", schema, "json")
      StreamingIngest.processBatch(batch("d0.json"), 0, paths)
      StreamingIngest.processBatch(batch("d1.json"), 1, paths)
      assert(StreamingIngest.storeFingerprints(spark, paths.store, beforeBatch = 1L)
        .count() === 1L)
      assert(StreamingIngest.storeFingerprints(spark, paths.store).count() === 2L)
      // empty store: well-typed empty relation, not an error
      assert(StreamingIngest.storeFingerprints(spark, s"$dir/nope").count() === 0L)
    } finally rm(dir)
  }

  test("near-dup ingest: store drop, within-batch drop, novel kept — " +
    "and the one-step chain law (a~b, b~c, a!~c retires BOTH b and c)") {
    val dir = tmp()
    try {
      val in = s"$dir/in"
      val paths = IngestPaths(s"$dir/c", s"$dir/s", s"$dir/q")
      // sliding 10-word windows over a 14-word sequence: J(a,b)=7/11,
      // J(b,c)=7/11 (both >= 0.5), J(a,c)=5/13 (< 0.5)
      val ws = (1 to 14).map(i => s"w$i")
      def win(from: Int) = ws.slice(from, from + 10).mkString(" ")
      val a = win(0); val b = win(2); val c = win(4)
      jsonl(s"$in/d0.json", doc(1, a), doc(2, "totally different words here"))
      // batch 1: 3 = store-dup of doc 1 (identical text), 4 novel,
      // 5 = within-dup of 4 (identical), plus the chain b(6)~a-store?
      jsonl(s"$in/d1.json", doc(3, a), doc(4, "unrelated novel content"),
        doc(5, "unrelated novel content"), doc(6, b), doc(7, c))
      def batch(f: String) = Sources.readValidated(spark, s"$in/$f", schema, "json")
      // rowsPerBand = 1 (16 single-row bands): candidate recall at
      // J >= 0.5 is effectively total, so the LAW is what's under test,
      // not the banding luck of a 5-doc fixture (q281 exercises the
      // production 4-row banding at corpus scale)
      def run(f: String, id: Long) = StreamingIngest.processBatchNearDup(
        batch(f), id, paths, rowsPerBand = 1).collect().head
      val r0 = run("d0.json", 0)
      assert(r0.getAs[Long]("n_kept") === 2L)
      val r1 = run("d1.json", 1)
      // 3 drops against the STORE (identical to survivor 1 = text a);
      // 5 drops WITHIN (identical to lower-id 4); 6 (= b) drops against
      // store-survivor a (J = 7/11); 7 (= c) drops within against
      // lower-id 6 EVEN THOUGH 6 itself dropped — the one-step law
      assert(r1.getAs[Long]("n_dropped_store") >= 2L,  // 3 and 6
        r1.toString)
      assert(r1.getAs[Long]("n_kept") === 1L, r1.toString) // only 4
      assert(corpusIds(paths) === Set(1L, 2L, 4L))
      // replay of batch 1 is row-identical (three-sink crash recovery)
      val r1b = run("d1.json", 1)
      assert(r1b.toSeq === r1.toSeq)
      assert(corpusIds(paths) === Set(1L, 2L, 4L))
    } finally rm(dir)
  }

  test("near-dup streaming wrapper drains deliveries under the same " +
    "checkpoint contract; hot-bucket cap thins candidates but the store " +
    "keeps full signatures") {
    val dir = tmp()
    try {
      val in = s"$dir/in"
      val paths = IngestPaths(s"$dir/c", s"$dir/s", s"$dir/q")
      jsonl(s"$in/d0.json", doc(1, "alpha beta gamma"), doc(2, "delta epsilon"))
      jsonl(s"$in/d1.json", doc(3, "alpha beta gamma"), doc(4, "zeta eta"))
      stamp(s"$in/d0.json", 10); stamp(s"$in/d1.json", 5)
      val q = StreamingIngest.ingestAvailableNearDup(spark, in, schema, paths,
        s"$dir/ckpt", maxFilesPerTrigger = 1)
      q.awaitTermination()
      assert(corpusIds(paths) === Set(1L, 2L, 4L)) // 3 identical to 1
      // store carries full band sets for every survivor: 4 bands each
      val bands = spark.read.option("basePath", s"$dir/s/bands")
        .parquet(s"$dir/s/bands")
      assert(bands.count() === 3L * 4L)
      // cap = 0 drops every candidate bucket: nothing can collide, so
      // an identical re-delivery is KEPT (recall loss is the documented
      // cost) — while its full signature still lands in the store
      val d2 = s"$dir/in2"
      jsonl(s"$d2/d.json", doc(5, "alpha beta gamma"))
      val r = StreamingIngest.processBatchNearDup(
        Sources.readValidated(spark, d2, schema, "json"), 99, paths,
        maxBucketSize = Some(0L)).collect().head
      assert(r.getAs[Long]("n_kept") === 1L)
      assert(r.getAs[Long]("n_dropped_store") === 0L)
      val bandsAfter = spark.read.option("basePath", s"$dir/s/bands")
        .parquet(s"$dir/s/bands").filter(col("ingest_batch") === 99)
      assert(bandsAfter.count() === 4L)
    } finally rm(dir)
  }

  test("malformed lines quarantine verbatim and never reach the corpus") {
    val dir = tmp()
    try {
      val in = s"$dir/in"
      val paths = IngestPaths(s"$dir/c", s"$dir/s", s"$dir/q")
      val bad = """{"doc_id": 9, "text": unquoted}"""
      jsonl(s"$in/d0.json", doc(1, "alpha beta"), bad)
      StreamingIngest.processBatch(
        Sources.readValidated(spark, in, schema, "json"), 0, paths)
      assert(corpusIds(paths) === Set(1L))
      val quar = StreamingIngest.quarantined(spark, paths).get
        .select("raw_line").collect().map(_.getString(0)).toSeq
      assert(quar === Seq(bad))
    } finally rm(dir)
  }
}
