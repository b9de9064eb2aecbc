package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Round-6 part twenty-two: Holt linear-trend forecaster (the
  * drift-aware sibling of q161's EWMA; third recursion-shaped oracle).
  */
object Round6uQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_holt_forecast" -> ((s, dir) =>
      TimeSeries.holtForecast(Tables.load(s, dir, "events"),
        "event_type")))

  val oracleSql: Map[String, String] = Map(
    "q183_holt_forecast" ->
      """WITH RECURSIVE
        |d0 AS (SELECT event_type AS key,
        |    date_trunc('day', ts)::DATE AS day,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT key, count(*) AS n FROM d0 GROUP BY key),
        |o AS (SELECT d0.*, row_number() OVER (PARTITION BY key
        |    ORDER BY day) AS rn FROM d0),
        |r AS (
        |  SELECT key, rn, y AS l, CAST(0 AS BIGINT) AS b,
        |    CAST(0 AS BIGINT) AS ae
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.key, o.rn,
        |    (3 * (r.l + r.b) + o.y) // 4,
        |    (3 * r.b + ((3 * (r.l + r.b) + o.y) // 4 - r.l)) // 4,
        |    r.ae + abs(o.y - (r.l + r.b))
        |  FROM r JOIN o ON o.key = r.key AND o.rn = r.rn + 1)
        |SELECT st.key AS event_type, CAST(st.n AS BIGINT) AS n_days,
        |  CAST(f.l AS BIGINT) AS level_final,
        |  CAST(f.b AS BIGINT) AS trend_final,
        |  CAST(f.l + f.b AS BIGINT) AS forecast_next,
        |  CASE WHEN st.n > 1 THEN CAST(f.ae // (st.n - 1) AS BIGINT) END
        |    AS mae_micro
        |FROM st JOIN r f ON f.key = st.key AND f.rn = st.n
        |ORDER BY event_type""".stripMargin)
}
