package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ProfileDrift, TimeSeries}

/** Round-6 part twenty-one: Q–Q decile drift table (WHERE the
  * distribution moved) and Fano-factor overdispersion (burstiness gate
  * for alert-band sizing).
  */
object Round6tQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_qq_drift" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cut = lit(Round5fQueries.PsiCutoff).cast("timestamp")
      ProfileDrift.qqReport(ev.filter(col("ts") < cut),
        ev.filter(col("ts") >= cut), "event_type", "value")
    }),

    // 3 of 5 event types read overdispersed at sf0.01 — binds both ways.
    "q182_fano" -> ((s, dir) =>
      TimeSeries.fanoReport(Tables.load(s, dir, "events"), "event_type")))

  val oracleSql: Map[String, String] = Map(
    "q181_qq_drift" ->
      s"""WITH v AS (SELECT CASE WHEN ts <
         |      TIMESTAMP '${Round5fQueries.PsiCutoff}'
         |      THEN 'ref' ELSE 'cur' END AS side, event_type AS g,
         |    CAST(round(value * 1e6) AS BIGINT) AS vm FROM events),
         |h AS (SELECT side, g, vm, count(*) AS c FROM v GROUP BY 1, 2, 3),
         |w AS (SELECT *,
         |    sum(c) OVER (PARTITION BY side, g ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY side, g) AS BIGINT) AS n
         |  FROM h),
         |qq AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS q),
         |p AS (SELECT side, g, q, n,
         |    CAST(min(CASE WHEN cum >= (q * n + 9) // 10 THEN vm END)
         |      AS BIGINT) AS pick
         |  FROM w, qq GROUP BY 1, 2, 3, 4),
         |r AS (SELECT g, q, n AS n_ref, pick AS ref_micro FROM p
         |  WHERE side = 'ref'),
         |c AS (SELECT g, q, n AS n_cur, pick AS cur_micro FROM p
         |  WHERE side = 'cur')
         |SELECT coalesce(r.g, c.g) AS event_type,
         |  coalesce(r.q, c.q) AS q_decile, r.n_ref, c.n_cur,
         |  r.ref_micro, c.cur_micro,
         |  c.cur_micro - r.ref_micro AS shift_micro
         |FROM r FULL OUTER JOIN c ON c.g = r.g AND c.q = r.q
         |ORDER BY event_type, q_decile""".stripMargin,

    "q182_fano" ->
      """WITH d AS (SELECT event_type AS key, date_trunc('day', ts) AS dd,
        |    count(*) AS c FROM events GROUP BY 1, 2),
        |s AS (SELECT key, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS sum_events,
        |    CAST(sum(c * c) AS BIGINT) AS scc FROM d GROUP BY 1)
        |SELECT key AS event_type, n_days, sum_events,
        |  CAST(n_days * scc - sum_events * sum_events AS BIGINT)
        |    AS var_num,
        |  CASE WHEN n_days > 1 AND sum_events > 0 THEN
        |    CAST(((n_days * scc - sum_events * sum_events) * 1000000) //
        |      ((n_days - 1) * sum_events) AS BIGINT) END AS fano_ppm,
        |  CASE WHEN n_days > 1 AND sum_events > 0 THEN
        |    ((n_days * scc - sum_events * sum_events) * 1000000) //
        |      ((n_days - 1) * sum_events) > 1000000 END AS overdispersed
        |FROM s ORDER BY event_type""".stripMargin)
}
