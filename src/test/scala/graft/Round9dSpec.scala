package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{SpanDedup, TextOps}

/** Round-9 part four specs: exact duplicated-span detection/removal.
  * Hand-built corpora with known shared runs; window length 3 keeps the
  * arithmetic checkable on paper.
  */
class Round9dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val L = 3

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("duplicatedSpans: a shared run flags only the LATER copy, " +
    "merged to one maximal span") {
    // docs share the 5-token run "a b c d e" → three 3-windows, all
    // flagged in doc 2 only, merging to span [1, 6) (6-1=5 tokens)
    val df = corpus(
      (1L, "a b c d e x y"),
      (2L, "z a b c d e q"))
    val spans = SpanDedup.duplicatedSpans(df, L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(spans.toSeq == Seq((2L, 1, 6, 3L)), spans.mkString(";"))
  }

  test("duplicatedSpans: disjoint shared runs stay separate spans; " +
    "touching runs merge") {
    // doc 3 copies doc 1's head run at positions 0.. and its tail run
    // far apart → two spans; doc 4 copies them adjacent → one span
    val df = corpus(
      (1L, "a b c x y z q w e r"),
      (3L, "a b c k k k k q w e"),
      (4L, "a b c q w e k k k k"))
    val spans = SpanDedup.duplicatedSpans(df, L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 3 flags "a b c"@0, the second "k k k"@4 (canonical is its
    // own @3), and "q w e"@7; [4,7) and [7,10) touch → merged [4,10)
    assert(spans.filter(_._1 == 3L) == Set((3L, 0, 3), (3L, 4, 10)),
      spans.toString)
    // doc 4 flags @0 @3 @6 @7 — every region touches → one span [0,10)
    assert(spans.filter(_._1 == 4L) == Set((4L, 0, 10)), spans.toString)
  }

  test("duplicatedSpans: WITHIN-doc repetition flags the second copy") {
    val df = corpus((7L, "a b c x a b c"))
    val spans = SpanDedup.duplicatedSpans(df, L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(spans.toSeq == Seq((7L, 4, 7, 1L)), spans.mkString(";"))
  }

  test("docReport + report: exact token accounting") {
    val df = corpus(
      (1L, "a b c d e x y"),
      (2L, "z a b c d e q"))
      .withColumn("source", lit("s1"))
    val doc = SpanDedup.docReport(df, L).collect()
    assert(doc.length == 1)
    val r = doc.head
    assert(r.getLong(0) == 2L && r.getLong(1) == 7L &&
      r.getLong(2) == 1L && r.getLong(3) == 3L && r.getLong(4) == 5L,
      r.toString)
    assert(r.getLong(5) == (5L * 1000000L) / 7L, r.toString)
    val rep = SpanDedup.report(df, "source", L).collect()
    assert(rep.length == 1)
    val g = rep.head
    assert(g.getString(0) == "s1" && g.getLong(1) == 2L &&
      g.getLong(2) == 1L && g.getLong(3) == 14L && g.getLong(4) == 5L,
      g.toString)
    assert(g.getLong(5) == (5L * 1000000L) / 14L, g.toString)
  }

  test("scrub: kept sequence drops exactly the span tokens and hashes " +
    "the remainder; clean docs hash their full sequence") {
    val df = corpus(
      (1L, "a b c d e x y"),
      (2L, "z a b c d e q"))
    val out = SpanDedup.scrub(df, L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    import spark.implicits._
    def hashOf(s: String): Long =
      Seq(s).toDF("x").select(TextOps.rollingHash(col("x")))
        .collect()(0).getLong(0)
    assert(out(1L) == ((7L, 7L, hashOf("a b c d e x y"))), out.toString)
    // doc 2 loses positions [1,6) = "a b c d e" → kept "z q"
    assert(out(2L) == ((7L, 2L, hashOf("z q"))), out.toString)
  }

  test("spansAgainst: corpus spans matching the reference flag with no " +
    "canonical-first exemption; clean docs stay clean") {
    import spark.implicits._
    val reference = corpus((100L, "a b c d e"))
    val c = corpus(
      (1L, "x a b c d e y"), // carries the reference run at [1,6)
      (2L, "p q r s t u v")) // clean
    val spans = graft.operators.SpanDedup
      .spansAgainst(c, reference, L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.toSeq == Seq((1L, 1, 6)), spans.mkString(";"))
    val rep = graft.operators.SpanDedup
      .decontReport(c.withColumn("source", lit("s")), reference,
        "source", L).collect()
    val g = rep.head
    // 2 docs, 1 contaminated, 14 tokens, 5 contaminated
    assert(g.getLong(1) == 2L && g.getLong(2) == 1L &&
      g.getLong(3) == 14L && g.getLong(4) == 5L, g.toString)
    assert(g.getLong(5) == (5L * 1000000L) / 14L, g.toString)
  }

  test("contaminatedTokens: the scan-stage fold counts the exact " +
    "coverage union, including overlapping flagged windows") {
    import spark.implicits._
    val reference = corpus((100L, "a b c d e"))
    val refHashes = graft.operators.SpanDedup
      .windowHashes(reference, L).select("h").distinct()
      .collect().map(_.getLong(0)).toSeq
    val c = corpus(
      (1L, "x a b c d e y"), // union of 3 overlapping windows = 5
      (2L, "p q r s t u v"), // clean → 0
      (3L, "a b"))           // shorter than L → 0
    val out = c.select(col("doc_id"), graft.operators.SpanDedup
        .contaminatedTokens(col("text"), refHashes, L).as("bad"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 5L, 2L -> 0L, 3L -> 0L), out.toString)
  }

  test("contaminatedTokens: streaming-safe — the same expression runs " +
    "in a streaming projection with no state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val reference = corpus((100L, "a b c d e"))
    val refHashes = graft.operators.SpanDedup
      .windowHashes(reference, L).select("h").distinct()
      .collect().map(_.getLong(0)).toSeq
    val input = MemoryStream[(Long, String)]
    val out = input.toDS().toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.SpanDedup
        .contaminatedTokens(col("text"), refHashes, L).as("bad"))
    val q = out.writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, "x a b c d e y"), (2L, "p q r s t u v")))
      q.processAllAvailable()
      val rows = spark.table("decon_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows == Map(1L -> 5L, 2L -> 0L), rows.toString)
    } finally q.stop()
  }

  test("contaminatedTokens: reference cap enforced loudly") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.SpanDedup.contaminatedTokens(col("text"),
        (0L to graft.operators.SpanDedup.MaxInPlanRefHashes.toLong)
          .toSeq, L)
    }
    assert(e.getMessage.contains("join tier"), e.getMessage)
  }

  test("windowHashes: short docs contribute nothing; counts are n-L+1") {
    val df = corpus((1L, "a b"), (2L, "a b c d"))
    val wh = SpanDedup.windowHashes(df, L).collect()
    assert(wh.forall(_.getLong(0) == 2L))
    assert(wh.length == 2, wh.mkString(";"))
  }

  test("PositionedWindowHashes ≡ the built-ins formulation " +
    "(differential, fixture-wide)") {
    import org.apache.spark.sql.functions._
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200)
    val ws = TextOps.tokens(col("text"))
    val builtins = when(size(ws) >= L,
      transform(sequence(lit(0), size(ws) - L),
        p => TextOps.rollingHash(concat_ws(" ", slice(ws, p + 1, lit(L))))))
      .otherwise(array().cast("array<bigint>"))
    val bad = d.select(
        graft.functions.PositionedWindowHashes
          .positionedWindowHashes(col("text"), L).as("nat"),
        builtins.as("ref"))
      .filter(col("nat") =!= col("ref"))
      .count()
    assert(bad == 0L, s"$bad docs diverge from the built-ins form")
    // punctuation/unicode edge: tokenizer equivalence rides TextTokens,
    // already differential-pinned; empty text yields the empty array
    import spark.implicits._
    val e = Seq((1L, ""), (2L, "ab"), (3L, "A,b!C d☃e f"))
      .toDF("doc_id", "text")
      .select(graft.functions.PositionedWindowHashes
        .positionedWindowHashes(col("text"), L).as("nat"), builtins.as("ref"))
      .filter(col("nat") =!= col("ref")).count()
    assert(e == 0L)
  }
}
