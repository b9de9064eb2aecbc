package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Rfm}

/** Round-6 part thirteen: ranking-quality evaluation (nDCG@k + MRR,
  * frozen discount literals) and RFM behavioral segmentation
  * (value-domain quintile boundaries, no corpus ntile).
  */
object Round6lQueries {

  val NdcgK = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // nDCG@10 / MRR of the length ranking against the is-English label
    // per source.
    "q162_ndcg" -> ((s, dir) =>
      Evaluation.ndcgReport(Tables.load(s, dir, "documents"),
        "source", "n_chars", "doc_id", col("lang") === "en", NdcgK)),

    // Per-user R/F/M metrics + 1-5 quintile scores from broadcast
    // order-statistic boundaries.
    "q163_rfm" -> ((s, dir) =>
      Rfm.rfmReport(Tables.load(s, dir, "events"))))

  val oracleSql: Map[String, String] = {
    val d = Evaluation.discountNano(NdcgK)
    val dList = d.mkString("[", ", ", "]")
    val ideal = (1 to NdcgK).map(i =>
      s"CASE WHEN n_relevant >= $i THEN CAST(${d(i - 1)} AS BIGINT) ELSE 0 END")
      .mkString(" + ")

    def bounds(metric: String): String = {
      val mins = (1 to 4).map(q =>
        s"min(CASE WHEN cum >= ($q * n + 4) // 5 THEN v END) AS b$q")
        .mkString(", ")
      s"""(SELECT $mins FROM (SELECT v, sum(c) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(c) OVER () AS n FROM (SELECT $metric AS v, count(*) AS c
         |    FROM u GROUP BY 1)))""".stripMargin
    }
    def ascScore(metric: String, p: String): String =
      (1 to 4).map(q =>
        s"CASE WHEN $metric > $p.b$q THEN 1 ELSE 0 END").mkString(" + ")

    Map(
      "q162_ndcg" ->
        s"""WITH r AS (SELECT * FROM (SELECT source AS g,
           |    CAST(n_chars AS BIGINT) AS s, doc_id AS id,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars DESC, doc_id ASC) AS rank
           |  FROM documents) WHERE rank <= $NdcgK),
           |g AS (SELECT g, count(*) AS n_items,
           |    CAST(sum(rel) AS BIGINT) AS n_relevant,
           |    CAST(sum(rel * (CAST($dList AS BIGINT[]))[rank]) AS BIGINT) AS dcg_nano,
           |    min(CASE WHEN rel = 1 THEN rank END) AS first_rel_rank
           |  FROM r GROUP BY g)
           |SELECT g AS source, CAST(n_items AS BIGINT) AS n_items,
           |  n_relevant, dcg_nano, CAST($ideal AS BIGINT) AS idcg_nano,
           |  CASE WHEN $ideal > 0 THEN
           |    round(dcg_nano::DOUBLE / ($ideal), 6) END AS ndcg,
           |  CAST(coalesce(CAST(round(1e9 / first_rel_rank) AS BIGINT), 0)
           |    AS BIGINT) AS mrr_nano
           |FROM g ORDER BY source""".stripMargin,

      "q163_rfm" ->
        s"""WITH hz AS (SELECT max(date_trunc('day', ts)::DATE) AS h
           |  FROM events),
           |u AS (SELECT user_id AS u,
           |    CAST(h - max(date_trunc('day', ts)::DATE) AS BIGINT)
           |      AS recency_days,
           |    count(*) AS frequency,
           |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
           |      AS monetary_micro
           |  FROM events, hz GROUP BY u, h),
           |rb AS ${bounds("recency_days")},
           |fb AS ${bounds("frequency")},
           |mb AS ${bounds("monetary_micro")}
           |SELECT u AS user_id, recency_days,
           |  CAST(frequency AS BIGINT) AS frequency, monetary_micro,
           |  CAST(6 - (${ascScore("recency_days", "rb")} + 1) AS BIGINT)
           |    AS r_q,
           |  CAST(${ascScore("frequency", "fb")} + 1 AS BIGINT) AS f_q,
           |  CAST(${ascScore("monetary_micro", "mb")} + 1 AS BIGINT) AS m_q
           |FROM u, rb, fb, mb ORDER BY user_id""".stripMargin)
  }
}
