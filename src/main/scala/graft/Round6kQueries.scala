package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Survival, TimeSeries}

/** Round-6 part twelve: Kaplan–Meier time-to-event curves (censoring-
  * correct) and the integer EWMA one-step forecaster.
  */
object Round6kQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Time-to-first-SEVERE-error per user (value > 150 — exactly half
    // the 150 users ever hit one at sf0.01, so observed and censored
    // populations both bind); right-censored at the horizon,
    // log-domain nano product, survival in exact ppm.
    "q160_kaplan_meier" -> ((s, dir) =>
      Survival.kaplanMeier(Tables.load(s, dir, "events"),
        col("event_type") === "error" && col("value") > 150)),

    // α=¼ integer EWMA per event type + one-step MAE.
    "q161_ewma_forecast" -> ((s, dir) =>
      TimeSeries.ewmaForecast(Tables.load(s, dir, "events"), "event_type")))

  val oracleSql: Map[String, String] = Map(
    "q160_kaplan_meier" ->
      """WITH u AS (SELECT user_id AS u,
        |    min(date_trunc('day', ts)::DATE) AS entry,
        |    min(CASE WHEN event_type = 'error' AND value > 150
        |      THEN date_trunc('day', ts)::DATE END) AS event_day
        |  FROM events GROUP BY 1),
        |b AS (SELECT max(date_trunc('day', ts)::DATE) AS horizon
        |  FROM events),
        |lt AS (SELECT CAST(CASE WHEN event_day IS NOT NULL
        |      THEN event_day - entry ELSE horizon - entry END AS BIGINT)
        |      AS t,
        |    event_day IS NOT NULL AS observed FROM u, b),
        |cs AS (SELECT t, sum(CASE WHEN observed THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN observed THEN 0 ELSE 1 END) AS c
        |  FROM lt GROUP BY t),
        |w AS (SELECT *, CAST(sum(d + c) OVER () -
        |      coalesce(sum(d + c) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_at_risk FROM cs),
        |k AS (SELECT *, CASE
        |    WHEN d > 0 AND n_at_risk > d THEN
        |      CAST(round(ln((n_at_risk - d)::DOUBLE / n_at_risk) * 1e9)
        |        AS BIGINT)
        |    WHEN d = n_at_risk THEN NULL ELSE 0 END AS cell_nano FROM w),
        |m AS (SELECT *, CAST(sum(cell_nano) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS extinct
        |  FROM k)
        |SELECT t, n_at_risk, CAST(d AS BIGINT) AS n_events,
        |  CAST(c AS BIGINT) AS n_censored,
        |  CASE WHEN extinct = 0 THEN cum END AS cum_ln_nano,
        |  CASE WHEN extinct = 1 THEN 0
        |    ELSE CAST(round(exp(cum::DOUBLE / 1e9) * 1e6) AS BIGINT) END
        |    AS survival_ppm
        |FROM m ORDER BY t""".stripMargin,

    "q161_ewma_forecast" ->
      """WITH RECURSIVE
        |d0 AS (SELECT event_type AS key,
        |    date_trunc('day', ts)::DATE AS day,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT key, count(*) AS n FROM d0 GROUP BY key),
        |o AS (SELECT d0.*, row_number() OVER (PARTITION BY key
        |    ORDER BY day) AS rn FROM d0),
        |r AS (
        |  SELECT key, rn, y AS s, CAST(0 AS BIGINT) AS ae
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.key, o.rn, (3 * r.s + o.y) // 4, r.ae + abs(o.y - r.s)
        |  FROM r JOIN o ON o.key = r.key AND o.rn = r.rn + 1)
        |SELECT st.key AS event_type, CAST(st.n AS BIGINT) AS n_days,
        |  CAST(f.s AS BIGINT) AS ewma_final,
        |  CASE WHEN st.n > 1 THEN CAST(f.ae // (st.n - 1) AS BIGINT) END
        |    AS mae_micro
        |FROM st JOIN r f ON f.key = st.key AND f.rn = st.n
        |ORDER BY event_type""".stripMargin)
}
