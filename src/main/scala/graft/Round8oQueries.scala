package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity

/** Round-8 part fifteen: ANN-fidelity evaluation — recall@k of the
  * LSH tier against the exact brute-force ranking.
  */
object Round8oQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Does the q37 bucketed search actually return the q36 truth —
    // per-query recall@5 of the scale path.
    "q258_ann_recall" -> ((s, dir) =>
      Similarity.annRecallReport(
        Tables.load(s, dir, "embeddings"),
        LlmQueries.annQueryIds, LlmQueries.annK)))

  val oracleSql: Map[String, String] = Map(
    "q258_ann_recall" -> {
      val bf = LlmQueries.oracleSql("q36_ann_bruteforce")
      val ls = LlmQueries.oracleSql("q37_ann_lsh")
      s"""WITH bf AS (SELECT * FROM ($bf)),
         |ls AS (SELECT * FROM ($ls)),
         |j AS (SELECT bf.query_id,
         |    CAST(count(*) AS BIGINT) AS n_exact,
         |    CAST(sum(CASE WHEN ls.vec_id IS NOT NULL THEN 1 ELSE 0
         |      END) AS BIGINT) AS n_hits
         |  FROM bf LEFT JOIN ls ON bf.query_id = ls.query_id AND
         |    bf.vec_id = ls.vec_id
         |  GROUP BY 1),
         |lc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_lsh
         |  FROM ls GROUP BY 1)
         |SELECT j.query_id, n_exact,
         |  coalesce(lc.n_lsh, 0) AS n_lsh, n_hits,
         |  (n_hits * 1000000) // n_exact AS recall_ppm
         |FROM j LEFT JOIN lc ON j.query_id = lc.query_id
         |ORDER BY j.query_id""".stripMargin
    })
}
