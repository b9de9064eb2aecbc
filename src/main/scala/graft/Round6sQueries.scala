package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}

/** Round-6 part twenty: label-noise audit by nearest-neighbor vote and
  * real MP3 frame-header parsing (compressed audio leaves the stub
  * list; video remains documented out-of-scope).
  */
object Round6sQueries {

  /** 30 anchors, k = 2 — on the fixture's geometry 27 anchors are
    * out-voted (suspect) and 3 agree with a neighbor, so the flag BINDS
    * both ways at sf0.01.
    */
  val NoiseAnchorIds: Seq[Long] = (0L until 30L)
  val NoiseK = 2

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_label_noise" -> ((s, dir) =>
      Similarity.labelAgreement(Tables.load(s, dir, "embeddings"),
        NoiseAnchorIds, NoiseK)),

    "q180_mp3_metadata" -> ((s, dir) =>
      Multimodal.mp3Metadata(
        Multimodal.synthesizeMp3Payloads(Tables.load(s, dir, "documents")))
        .orderBy("doc_id")))

  val oracleSql: Map[String, String] = Map(
    "q179_label_noise" -> {
      val ids = NoiseAnchorIds.mkString("(", ", ", ")")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv, label AS ql FROM e
         |  WHERE vec_id IN $ids),
         |s AS (SELECT query_id, ql, e.vec_id, label AS nb,
         |    round(list_cosine_similarity(qv, v), 4) AS cs
         |  FROM q, e WHERE e.vec_id <> query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cs DESC, vec_id) AS rk FROM s),
         |a AS (SELECT query_id, ql AS q_label,
         |    CAST(count(*) AS BIGINT) AS k_used,
         |    CAST(sum(CASE WHEN nb = ql THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_agree
         |  FROM r WHERE rk <= $NoiseK GROUP BY 1, 2)
         |SELECT query_id, q_label, k_used, n_agree,
         |  CAST((n_agree * 1000000) // k_used AS BIGINT) AS agree_ppm,
         |  (n_agree * 2 < k_used) AS suspect
         |FROM a ORDER BY query_id""".stripMargin
    },

    // the parser's output in closed form from doc_id alone — if the
    // frame walk mis-reads any header field, the hash flips
    "q180_mp3_metadata" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128
        |    WHEN 2 THEN 192 ELSE 320 END AS INTEGER) AS bitrate_kbps,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |    ELSE 32000 END AS INTEGER) AS sample_rate,
        |  CAST(1 + doc_id % 5 AS BIGINT) AS n_frames,
        |  CAST(((1 + doc_id % 5) * 1152 * 1000) //
        |    (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |      ELSE 32000 END) AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin)
}
