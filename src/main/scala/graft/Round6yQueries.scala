package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-6 part twenty-six: deterministic uniform negative sampling
  * (the hard-negatives control arm) and the dedup survivorship matrix
  * (which sources lose content when clusters collapse).
  */
object Round6yQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q190_random_negatives" -> ((s, dir) =>
      Similarity.randomNegatives(Tables.load(s, dir, "embeddings"),
        Round6oQueries.HardNegQueryIds, Round6oQueries.HardNegK)),

    "q191_dedup_survivorship" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      Dedup.survivorshipMatrix(d, Dedup.minhashNearDups(d))
    }))

  val oracleSql: Map[String, String] = Map(
    "q190_random_negatives" -> {
      val ids = Round6oQueries.HardNegQueryIds.mkString("(", ", ", ")")
      s"""WITH e AS (SELECT vec_id, label FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label AS ql FROM e
         |  WHERE vec_id IN $ids),
         |s AS (SELECT query_id, ql AS q_label, vec_id, label AS neg_label,
         |    md5(query_id::VARCHAR || ':' || vec_id::VARCHAR) AS h
         |  FROM q, e WHERE label <> ql),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY h DESC, vec_id) AS INTEGER) AS rank FROM s)
         |SELECT query_id, q_label, vec_id, neg_label, rank
         |FROM r WHERE rank <= ${Round6oQueries.HardNegK}
         |ORDER BY query_id, rank""".stripMargin
    },

    "q191_dedup_survivorship" ->
      s"""WITH RECURSIVE ${LlmQueries.minhashPairsCtes},
         |pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |r AS (SELECT DISTINCT src AS id, src AS lab FROM edges
         |  UNION SELECT e.src, r.lab FROM edges e JOIN r ON e.dst = r.id),
         |cc AS (SELECT id, min(lab) AS cluster FROM r GROUP BY id),
         |dd AS (SELECT cc.id, cc.cluster, doc.source FROM cc
         |  JOIN documents doc ON doc.doc_id = cc.id),
         |w AS (SELECT cluster, min(id) AS winner FROM dd GROUP BY cluster),
         |ws AS (SELECT w.cluster, w.winner, dd.source AS kept_source
         |  FROM w JOIN dd ON dd.id = w.winner)
         |SELECT ws.kept_source, dd.source AS dropped_source,
         |  CAST(count(*) AS BIGINT) AS n_dropped
         |FROM dd JOIN ws ON ws.cluster = dd.cluster
         |WHERE dd.id <> ws.winner
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
