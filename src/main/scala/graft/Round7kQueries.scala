package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal

/** Round-7 part six: MP4/ISO-BMFF container metadata — the video
  * column's real parseable layer (duration, tracks, dimensions from
  * the moov box tree; frame decode stays documented out-of-scope).
  */
object Round7kQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q207_mp4_metadata" -> ((s, dir) =>
      Multimodal.mp4Metadata(
        Multimodal.synthesizeMp4Payloads(Tables.load(s, dir, "documents")))
        .orderBy("doc_id")))

  val oracleSql: Map[String, String] = Map(
    // synthesis parameters derive from doc_id alone, so the oracle
    // recomputes the expected metadata without parsing bytes (the
    // q180 convention)
    "q207_mp4_metadata" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |    ELSE 90000 END AS INTEGER) AS timescale,
        |  CAST((1 + doc_id % 7) * 1000 AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS n_tracks,
        |  CAST(320 + 16 * (doc_id % 4) AS INTEGER) AS width,
        |  CAST(240 + 16 * (doc_id % 4) AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin)
}
