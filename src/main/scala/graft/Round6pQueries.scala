package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, EventFunnel}

/** Round-6 part seventeen: conversion-latency quartiles by start cohort
  * and Fightin'-Words distinctive vocabulary per source.
  */
object Round6pQueries {

  /** q171 conversion: first 'view' → first high-value purchase. The
    * value floor makes non-converters BIND at sf0.01 (116 of 150 users
    * convert).
    */
  val ConvMinValue = 100.0

  val DistinctiveVocab = 500
  val DistinctiveAlpha0 = 1000L
  val DistinctiveTopK = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q171_conversion_latency" -> ((s, dir) =>
      EventFunnel.conversionLatency(Tables.load(s, dir, "events"),
        col("event_type") === "view",
        col("event_type") === "purchase" && col("value") > ConvMinValue)),

    "q172_distinctive_terms" -> ((s, dir) =>
      CorpusStats.distinctiveTerms(Tables.load(s, dir, "documents"),
        "source", DistinctiveVocab, DistinctiveAlpha0, DistinctiveTopK)))

  val oracleSql: Map[String, String] = Map(
    "q171_conversion_latency" ->
      s"""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
         |    (event_type = 'view') AS isa,
         |    (event_type = 'purchase' AND value > $ConvMinValue) AS isb
         |  FROM events
         |  WHERE event_type = 'view'
         |    OR (event_type = 'purchase' AND value > $ConvMinValue)),
         |fa AS (SELECT u, min(t) AS ta FROM e WHERE isa GROUP BY u),
         |cv AS (SELECT fa.u, fa.ta, min(e.t) AS tb FROM fa
         |  JOIN e ON e.u = fa.u AND e.isb AND e.t >= fa.ta
         |  GROUP BY fa.u, fa.ta),
         |st AS (SELECT make_timestamp(ta)::DATE AS day,
         |    CAST(count(*) AS BIGINT) AS n_started FROM fa GROUP BY 1),
         |c AS (SELECT make_timestamp(ta)::DATE AS day, tb - ta AS dt,
         |    count(*) AS c FROM cv GROUP BY 1, 2),
         |w AS (SELECT *,
         |    sum(c) OVER (PARTITION BY day ORDER BY dt
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY day) AS BIGINT) AS n,
         |    CAST(sum(dt * c) OVER (PARTITION BY day) AS BIGINT) AS s
         |  FROM c),
         |q AS (SELECT day, n, s,
         |    CAST(min(CASE WHEN cum >= (n + 3) // 4 THEN dt END)
         |      AS BIGINT) AS p25_us,
         |    CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN dt END)
         |      AS BIGINT) AS p50_us,
         |    CAST(min(CASE WHEN cum >= (3 * n + 3) // 4 THEN dt END)
         |      AS BIGINT) AS p75_us,
         |    CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN dt END)
         |      AS BIGINT) AS p90_us
         |  FROM w GROUP BY day, n, s)
         |SELECT st.day, st.n_started,
         |  coalesce(q.n, 0) AS n_converted,
         |  CAST((coalesce(q.n, 0) * 1000000) // st.n_started AS BIGINT)
         |    AS conv_ppm,
         |  CASE WHEN coalesce(q.n, 0) > 0 THEN CAST(q.s // q.n AS BIGINT)
         |    END AS mean_us,
         |  q.p25_us, q.p50_us, q.p75_us, q.p90_us
         |FROM st LEFT JOIN q ON q.day = st.day
         |ORDER BY st.day""".stripMargin,

    "q172_distinctive_terms" ->
      s"""WITH tok AS (SELECT source AS g,
         |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
         |  FROM documents),
         |census AS (SELECT g, w, CAST(count(*) AS BIGINT) AS y_gw
         |  FROM tok GROUP BY 1, 2),
         |vocab AS (SELECT w, CAST(sum(y_gw) AS BIGINT) AS y_w FROM census
         |  GROUP BY w ORDER BY y_w DESC, w LIMIT $DistinctiveVocab),
         |gt AS (SELECT g, CAST(sum(y_gw) AS BIGINT) AS n_g FROM census
         |  GROUP BY g),
         |nn AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_all FROM gt),
         |grid AS (SELECT gt.g, gt.n_g, v.w, v.y_w,
         |    CAST(coalesce(c.y_gw, 0) AS BIGINT) AS y_gw, nn.n_all
         |  FROM gt CROSS JOIN vocab v
         |  LEFT JOIN census c ON c.g = gt.g AND c.w = v.w, nn),
         |zz AS (SELECT *,
         |    round((ln((y_gw + $DistinctiveAlpha0 * (y_w / n_all)) /
         |        ((n_g + $DistinctiveAlpha0 - y_gw) -
         |          $DistinctiveAlpha0 * (y_w / n_all))) -
         |      ln(((y_w - y_gw) + $DistinctiveAlpha0 * (y_w / n_all)) /
         |        ((n_all - n_g + $DistinctiveAlpha0 - (y_w - y_gw)) -
         |          $DistinctiveAlpha0 * (y_w / n_all)))) /
         |      sqrt(1.0 / (y_gw + $DistinctiveAlpha0 * (y_w / n_all)) +
         |        1.0 / ((y_w - y_gw) +
         |          $DistinctiveAlpha0 * (y_w / n_all))), 6) AS z_lo
         |  FROM grid),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY g
         |    ORDER BY z_lo DESC, w) AS INTEGER) AS rank FROM zz)
         |SELECT g AS source, w AS token, y_gw, y_w, n_g, z_lo, rank
         |FROM r WHERE rank <= $DistinctiveTopK
         |ORDER BY source, rank""".stripMargin)
}
