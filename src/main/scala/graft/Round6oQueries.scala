package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextOps, TimeSeries}

/** Round-6 part sixteen: inter-arrival cadence quartiles, hard-negative
  * mining for contrastive training, and per-document character entropy
  * (the Gopher-style "is this actually text?" quality signal).
  */
object Round6oQueries {

  /** Anchor set for q169 — the q36 ANN query ids. */
  val HardNegQueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)
  val HardNegK = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-type usage cadence: consecutive-event gaps per (user, type),
    // exact value-domain quartiles off the gap census.
    "q168_inter_arrival" -> ((s, dir) =>
      TimeSeries.interArrivalReport(Tables.load(s, dir, "events"),
        "event_type")),

    // For each anchor vector: top-k most-similar DIFFERENT-label
    // vectors — the InfoNCE denominator miner.
    "q169_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(Tables.load(s, dir, "embeddings"),
        HardNegQueryIds, HardNegK)),

    // Char-entropy quality signal per document, scan-stage fold (runs
    // of the sorted char array ≡ the oracle's unnest census).
    "q170_char_entropy" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("__e", TextOps.charEntropyNano(col("text")))
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("n_ch"),
          col("__e.n_runs").as("n_distinct_ch"),
          col("__e.ent_nano").as("ent_nano"))
        .orderBy("doc_id")))

  val oracleSql: Map[String, String] = Map(
    "q168_inter_arrival" ->
      """WITH e AS (SELECT event_type AS k, user_id AS u,
        |    epoch_us(ts) AS t, event_id AS eid FROM events),
        |d AS (SELECT k, t - lag(t) OVER (PARTITION BY u, k
        |    ORDER BY t, eid) AS dt FROM e),
        |c AS (SELECT k, dt, count(*) AS c FROM d WHERE dt IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT *,
        |    sum(c) OVER (PARTITION BY k ORDER BY dt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY k) AS BIGINT) AS n,
        |    CAST(sum(dt * c) OVER (PARTITION BY k) AS BIGINT) AS s
        |  FROM c)
        |SELECT k AS event_type, n AS n_gaps,
        |  CAST(s // n AS BIGINT) AS mean_us,
        |  CAST(min(CASE WHEN cum >= (n + 3) // 4 THEN dt END)
        |    AS BIGINT) AS p25_us,
        |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN dt END)
        |    AS BIGINT) AS p50_us,
        |  CAST(min(CASE WHEN cum >= (3 * n + 3) // 4 THEN dt END)
        |    AS BIGINT) AS p75_us,
        |  CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN dt END)
        |    AS BIGINT) AS p90_us
        |FROM w GROUP BY k, n, s ORDER BY event_type""".stripMargin,

    "q169_hard_negatives" -> {
      val ids = HardNegQueryIds.mkString("(", ", ", ")")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv, label AS ql FROM e
         |  WHERE vec_id IN $ids),
         |s AS (SELECT query_id, ql AS q_label, vec_id, label AS neg_label,
         |    round(list_cosine_similarity(qv, v), 4) AS cos_sim
         |  FROM q, e WHERE label <> ql),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank FROM s)
         |SELECT query_id, q_label, vec_id, neg_label, cos_sim, rank
         |FROM r WHERE rank <= $HardNegK ORDER BY query_id, rank""".stripMargin
    },

    "q170_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
        |  FROM documents),
        |cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
        |nn AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ch FROM cc
        |  GROUP BY 1),
        |e AS (SELECT cc.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_distinct_ch,
        |    CAST(sum(CAST(round(-(cnt / n_ch) * ln(cnt / n_ch) * 1e9)
        |      AS BIGINT)) AS BIGINT) AS ent_nano
        |  FROM cc JOIN nn ON nn.doc_id = cc.doc_id GROUP BY 1)
        |SELECT d.doc_id, d.lang, nn.n_ch, e.n_distinct_ch, e.ent_nano
        |FROM documents d JOIN nn ON nn.doc_id = d.doc_id
        |  JOIN e ON e.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin)
}
