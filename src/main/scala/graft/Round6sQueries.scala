package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-6 part twenty: label-noise audit by nearest-neighbor vote. */
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
        NoiseAnchorIds, NoiseK)))

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
    })
}
