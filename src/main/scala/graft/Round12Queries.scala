package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.FormatRoundTrip

/** Round-12: the compression-codec axis of the interchange tier
  * (round-11 verdict task 6). q282 drives every [[FormatRoundTrip
  * .CodecMatrix]] cell — text formats × gzip/deflate, ORC × snappy/zstd,
  * parquet × gzip/zstd — through write→read→checksum; the DuckDB oracle
  * recomputes the checksum row once from the parquet source and
  * replicates it across the matrix, so EVERY codec must reproduce the
  * identical relation bit-for-bit, and `smaller_than_plain` (bytes vs
  * the same format uncompressed) pins that each codec actually
  * compressed — the frozen-constant fidelity convention.
  */
object Round12Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q282_codec_roundtrip" -> ((s, dir) =>
      graft.util.TempDirs.withTempDir("graft-q282") { tmp =>
        FormatRoundTrip.codecMatrixChecksums(s,
          Tables.load(s, dir, "documents"), tmp).localCheckpoint()
      }))

  val oracleSql: Map[String, String] = Map(
    "q282_codec_roundtrip" -> {
      val cells = FormatRoundTrip.CodecMatrix
        .map { case (f, c) => s"('$f', '$c')" }.mkString(", ")
      s"""WITH ck AS (${Round11bQueries.docChecksumSql})
         |SELECT m.format, m.codec, ck.*, TRUE AS smaller_than_plain
         |FROM (VALUES $cells) AS m(format, codec) CROSS JOIN ck
         |ORDER BY m.format, m.codec""".stripMargin
    })
}
