package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.FormatRoundTrip

/** Round-11b: interchange-format round trips (q277–q279). The oracle
  * grades the checksums against the parquet source; these specs pin
  * the parts the oracle cannot see — byte-level fidelity per row
  * across each format, the non-vacuity of the hostile suffixes, and
  * the PERMISSIVE corrupt capture actually firing on malformed input.
  */
class Round11bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-rt-spec").toFile.getAbsolutePath

  private def rm(root: String): Unit = graft.util.TempDirs.rm(root)

  /** Tiny corpus that exercises every hostile class (doc_id 0..7). */
  private def docs() = {
    import spark.implicits._
    (0L until 8L).map(i => (i, s"doc $i body", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect().head

  test("jsonl round trip: checksum equals the source relation's, zero corrupt") {
    val dir = tmp()
    try {
      val got = rows(FormatRoundTrip.jsonlRoundTrip(spark, docs(), s"$dir/j"))
      assert(got.getAs[Long]("n_rows") === 8L)
      assert(got.getAs[Long]("n_corrupt") === 0L)
      assert(got.getAs[Long]("n_multiline") === 2L) // doc_id 0, 4
      assert(got.getAs[Long]("n_distinct") === 8L)
    } finally rm(dir)
  }

  test("csv round trip == jsonl round trip checksum (same relation " +
    "through both dialects, trailing tab and unicode included)") {
    val dir = tmp()
    try {
      val j = rows(FormatRoundTrip.jsonlRoundTrip(spark, docs(), s"$dir/j"))
      val c = rows(FormatRoundTrip.csvRoundTrip(spark, docs(), s"$dir/c"))
      Seq("n_rows", "n_corrupt", "total_chars", "n_distinct",
        "n_multiline", "row_xor", "md5_min").foreach { col =>
        assert(j.getAs[Any](col) === c.getAs[Any](col), col)
      }
    } finally rm(dir)
  }

  test("csv round trip is byte-exact per row (text2 survives newline, " +
    "quote, backslash, tab, non-ASCII)") {
    val dir = tmp()
    try {
      val src = FormatRoundTrip.hostileDocs(docs())
      src.write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(s"$dir/c")
      val back = spark.read.format("csv")
        .schema(new StructType()
          .add("doc_id", LongType).add("text2", StringType).add("lang", StringType))
        .option("header", "true").option("escape", "\"")
        .option("multiLine", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .load(s"$dir/c")
      val want = src.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === want)
      // the hostile classes are actually present post-trip
      assert(got.values.count(_.contains("\n")) === 2)
      assert(got.values.count(_.contains("\\slash\t")) === 2)
      assert(got.values.count(_.contains("\u20ac\u4e2d\u00e9")) === 2)
      assert(got.values.count(_.contains("\"quoted\"")) === 2)
    } finally rm(dir)
  }

  test("permissive corrupt capture fires: a malformed jsonl line lands " +
    "in n_corrupt, clean rows still count") {
    val dir = tmp()
    try {
      FormatRoundTrip.hostileDocs(docs()).coalesce(1)
        .write.mode("overwrite").json(s"$dir/j")
      // append a malformed line to the single part file
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/j"))
        .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
      java.nio.file.Files.writeString(part,
        "\n{\"doc_id\": 99, \"text2\": unquoted}\n",
        java.nio.file.StandardOpenOption.APPEND)
      // drop the LocalFileSystem checksum sidecar the raw append broke
      java.nio.file.Files.deleteIfExists(
        part.resolveSibling("." + part.getFileName.toString + ".crc"))
      val got = rows(FormatRoundTrip.jsonlRoundTripRead(spark, s"$dir/j"))
      assert(got.getAs[Long]("n_corrupt") === 1L)
      assert(got.getAs[Long]("n_rows") === 9L) // 8 clean + 1 corrupt row
    } finally rm(dir)
  }

  test("orc round trip: typed checksum equals the parquet-direct one " +
    "(timestamp seconds and half-even cents exact)") {
    import spark.implicits._
    val dir = tmp()
    try {
      val ev = Seq(
        (1L, java.sql.Timestamp.valueOf("2025-01-02 03:04:05.678"), 10L, "click", 1.005, "{\"a\":1}"),
        (2L, java.sql.Timestamp.valueOf("2025-06-07 08:09:10.999"), 11L, "view", 2.675, "{}"),
        (3L, java.sql.Timestamp.valueOf("2025-12-31 23:59:59.001"), 12L, "click", -0.125, "x"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val viaOrc = rows(FormatRoundTrip.orcRoundTrip(spark, ev, s"$dir/o"))
      // same checksum computed directly (no format hop)
      val direct = rows(FormatRoundTrip.eventChecksum(ev))
      Seq("n_rows", "id_sum", "ts_epoch_sum", "value_cents", "n_types",
        "row_xor").foreach { c =>
        assert(viaOrc.getAs[Any](c) === direct.getAs[Any](c), c)
      }
      assert(viaOrc.getAs[Long]("n_rows") === 3L)
      // rint half-even: 1.005*100 = 100.49999... -> 100; 2.675*100 is
      // EXACTLY 267.5 -> 268 (to even); -0.125*100 = -12.5 -> -12 (to even)
      assert(viaOrc.getAs[Long]("value_cents") === (100L + 268L - 12L))
    } finally rm(dir)
  }
}
