package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ProductQuantization, Similarity}

/** Round-9 part one: recall@k fidelity reports for the remaining ANN
  * tiers — IVF (q261), PQ (q262), IVF-PQ (q263) — graded against the
  * exact brute-force ranking exactly as q258 grades the LSH tier. Each
  * tier's ranking and the exact ranking are both deterministic and
  * individually hash-green (q42 / q60 / q102 / q36), so the recall rows
  * are fully oracle-backed: the DuckDB side composes those queries'
  * oracle CTEs verbatim. A recall cliff in any tier — a bad codebook,
  * a centroid drift, a probe bug — flips a recall_ppm value and goes
  * hash-red the day it happens.
  */
object Round9Queries {

  private def embs(s: SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Single-probe IVF (q42's ranking) vs exact top-k.
    "q261_ann_recall_ivf" -> ((s, dir) =>
      Similarity.recallVsExact(embs(s, dir),
        Similarity.ivfTopK(embs(s, dir), Round3Queries.AnnQueryIds,
          Round3Queries.AnnK, Round5gQueries.IvfCentroidIds),
        Round3Queries.AnnQueryIds, Round3Queries.AnnK)),

    // PQ asymmetric-distance top-k (q60's ranking) vs exact top-k.
    "q262_ann_recall_pq" -> ((s, dir) =>
      Similarity.recallVsExact(embs(s, dir),
        ProductQuantization.adcTopK(embs(s, dir),
          Round3Queries.AnnQueryIds, Round3Queries.AnnK,
          Round3Queries.PqCodebookIds),
        Round3Queries.AnnQueryIds, Round3Queries.AnnK)),

    // IVF coarse cells + PQ residual codes (q102's ranking) vs exact.
    "q263_ann_recall_ivfpq" -> ((s, dir) =>
      Similarity.recallVsExact(embs(s, dir),
        ProductQuantization.ivfAdcTopK(embs(s, dir),
          Round3Queries.AnnQueryIds, Round3Queries.AnnK,
          Round5gQueries.IvfCentroidIds, Round3Queries.PqCodebookIds),
        Round3Queries.AnnQueryIds, Round3Queries.AnnK)))

  /** q258's recall SQL shape over an arbitrary approx tier's oracle. */
  private def recallOracle(approxSql: String): String = {
    val bf = LlmQueries.oracleSql("q36_ann_bruteforce")
    s"""WITH bf AS (SELECT * FROM ($bf)),
       |ap AS (SELECT * FROM ($approxSql)),
       |j AS (SELECT bf.query_id,
       |    CAST(count(*) AS BIGINT) AS n_exact,
       |    CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0
       |      END) AS BIGINT) AS n_hits
       |  FROM bf LEFT JOIN ap ON bf.query_id = ap.query_id AND
       |    bf.vec_id = ap.vec_id
       |  GROUP BY 1),
       |ac AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_approx
       |  FROM ap GROUP BY 1)
       |SELECT j.query_id, n_exact,
       |  coalesce(ac.n_approx, 0) AS n_approx, n_hits,
       |  (n_hits * 1000000) // n_exact AS recall_ppm
       |FROM j LEFT JOIN ac ON j.query_id = ac.query_id
       |ORDER BY j.query_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q261_ann_recall_ivf" ->
      recallOracle(LlmQueries.oracleSql("q42_ann_ivf")),
    "q262_ann_recall_pq" ->
      recallOracle(Round3Queries.oracleSql("q60_ann_pq")),
    "q263_ann_recall_ivfpq" ->
      recallOracle(Round5gQueries.oracleSql("q102_ann_ivfpq")))
}
