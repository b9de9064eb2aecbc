package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.FormatRoundTrip

/** Round-11b: interchange-format round trips (SURVEY §2.1 source/sink
  * tier widened past parquet). Each query writes a derived relation
  * through a format — JSONL (q277), RFC-4180 CSV (q278), ORC (q279) —
  * reads it back, and reduces to a one-row checksum whose every cell
  * the DuckDB oracle recomputes from the PARQUET source. The format
  * layer sits only on the Spark side of the comparison, so any row,
  * character, or type it corrupts flips the hash; `n_corrupt` grades
  * the PERMISSIVE corrupt-record capture at exactly 0.
  *
  * Escaping non-vacuity: q277/q278 run on
  * [[FormatRoundTrip.hostileDocs]] — text + a `doc_id % 4` suffix
  * cycling embedded newline / backslash+tab / non-ASCII BMP /
  * comma+quotes — and `n_multiline` pins ~¼ of rows carrying a real
  * embedded newline through the dialect. Oracle states the identical
  * derivation with `chr()` codes.
  */
object Round11bQueries {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def cleanup(root: String): Unit = graft.util.TempDirs.rm(root)

  private def roundTrip(prefix: String)(body: String => DataFrame): DataFrame = {
    val tmp = tmpDir(prefix)
    // eager localCheckpoint materializes the one checksum row before
    // the staging files go (same lifetime law as q275's collect)
    try body(tmp).localCheckpoint()
    finally cleanup(tmp)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q277_jsonl_roundtrip" -> ((s, dir) => roundTrip("graft-q277") { tmp =>
      FormatRoundTrip.jsonlRoundTrip(s,
        Tables.load(s, dir, "documents"), s"$tmp/docs-jsonl")
    }),

    "q278_csv_roundtrip" -> ((s, dir) => roundTrip("graft-q278") { tmp =>
      FormatRoundTrip.csvRoundTrip(s,
        Tables.load(s, dir, "documents"), s"$tmp/docs-csv")
    }),

    "q279_orc_roundtrip" -> ((s, dir) => roundTrip("graft-q279") { tmp =>
      FormatRoundTrip.orcRoundTrip(s,
        Tables.load(s, dir, "events"), s"$tmp/events-orc")
    }))

  /** The hostile-text derivation, stated in DuckDB (chr(10) newline,
    * chr(92) backslash, chr(9) tab, chr(8364)/chr(20013)/chr(233) =
    * € 中 é) — byte-identical to [[FormatRoundTrip.HostileSuffixes]].
    */
  private val hostileSql =
    """SELECT doc_id,
      |    text || CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN chr(10) || 'line2,"q"'
      |      WHEN 1 THEN chr(92) || 'slash' || chr(9)
      |      WHEN 2 THEN ' ' || chr(8364) || chr(20013) || chr(233)
      |      ELSE ',comma "quoted"' END AS text2,
      |    lang FROM documents""".stripMargin

  /** 60-bit md5 fingerprint (Spark `conv(substring(md5(s),1,15),16,10)`
    * parity).
    */
  private def fp(s: String): String =
    s"CAST(concat('0x', substring(md5($s), 1, 15)) AS BIGINT)"

  /** Shared with [[Round12Queries]]'s codec-matrix oracle. */
  private[graft] val docChecksumSql =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(0 AS BIGINT) AS n_corrupt,
       |  CAST(sum(length(text2)) AS BIGINT) AS total_chars,
       |  CAST(count(DISTINCT md5(text2)) AS BIGINT) AS n_distinct,
       |  CAST(count(*) FILTER (contains(text2, chr(10))) AS BIGINT) AS n_multiline,
       |  CAST(bit_xor(${fp("concat_ws('|', doc_id, text2, lang)")}) AS BIGINT) AS row_xor,
       |  min(md5(concat_ws('|', doc_id, text2, lang))) AS md5_min
       |FROM ($hostileSql)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q277_jsonl_roundtrip" -> docChecksumSql,
    "q278_csv_roundtrip" -> docChecksumSql,

    "q279_orc_roundtrip" -> {
      val epoch = "CAST(floor(epoch(ts)) AS BIGINT)"
      val cents = "CAST(round_even(value * 100, 0) AS BIGINT)"
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  CAST(sum($epoch) AS BIGINT) AS ts_epoch_sum,
         |  CAST(sum($cents) AS BIGINT) AS value_cents,
         |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         |  CAST(bit_xor(${fp(
             s"concat_ws('|', event_id, $epoch, user_id, event_type, $cents, props)")}) AS BIGINT) AS row_xor
         |FROM events""".stripMargin
    })
}
