package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-7 part fifteen: capture–recapture sizing of the near-dup
  * population from the MinHash and SimHash detectors.
  */
object Round7tQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q219_capture_recapture" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.captureRecapture(
        Dedup.minhashNearDups(docs),
        Dedup.simhashPairs(docs, "source", 3))
    }))

  val oracleSql: Map[String, String] = Map(
    // both detectors' pair CTEs are the q34/q35 oracles verbatim
    "q219_capture_recapture" ->
      s"""WITH ${LlmQueries.minhashPairsCtes}
         |, mp AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
         |t2 AS (SELECT doc_id, source, ${LlmQueries.tokSql} AS ws
         |  FROM documents),
         |hh2 AS (SELECT doc_id, source,
         |  list_transform(ws, w -> ${LlmQueries.rollSql("w")}) AS hs
         |  FROM t2),
         |sg2 AS (SELECT doc_id, source, ${LlmQueries.simhashSql} AS sh
         |  FROM hh2),
         |sp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sg2 a JOIN sg2 b ON a.source = b.source
         |    AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
         |s AS (SELECT
         |    (SELECT CAST(count(*) AS BIGINT) FROM mp) AS n_a,
         |    (SELECT CAST(count(*) AS BIGINT) FROM sp) AS n_b,
         |    (SELECT CAST(count(*) AS BIGINT) FROM mp
         |      JOIN sp USING (doc_a, doc_b)) AS n_both)
         |SELECT n_a, n_b, n_both,
         |  CAST(((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1 AS BIGINT)
         |    AS est_total,
         |  CASE WHEN ((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1 > 0
         |    THEN CAST((n_a * 1000000) //
         |      (((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1) AS BIGINT)
         |    END AS recall_a_ppm,
         |  CASE WHEN ((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1 > 0
         |    THEN CAST((n_b * 1000000) //
         |      (((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1) AS BIGINT)
         |    END AS recall_b_ppm
         |FROM s""".stripMargin)
}
