package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Constraints

/** Round-6 part thirty-two: inferred range contracts — the release
  * gate that learns each key's value envelope from a trusted snapshot
  * and audits the next one against it.
  */
object Round7eQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_range_contract" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cut = lit(Round5fQueries.PsiCutoff).cast("timestamp")
      Constraints.rangeContractReport(ev.filter(col("ts") < cut),
        ev.filter(col("ts") >= cut), "event_type", "value")
    }))

  val oracleSql: Map[String, String] = Map(
    "q200_range_contract" ->
      s"""WITH b AS (SELECT event_type AS k, min(value) AS lo,
         |    max(value) AS hi FROM events
         |  WHERE ts < TIMESTAMP '${Round5fQueries.PsiCutoff}' GROUP BY 1),
         |c AS (SELECT e.event_type AS k, e.value AS v, b.lo, b.hi
         |  FROM events e LEFT JOIN b ON b.k = e.event_type
         |  WHERE e.ts >= TIMESTAMP '${Round5fQueries.PsiCutoff}'),
         |a AS (SELECT k, lo IS NOT NULL AS known_key,
         |    CAST(round(lo * 1e6) AS BIGINT) AS lo_micro,
         |    CAST(round(hi * 1e6) AS BIGINT) AS hi_micro,
         |    CAST(count(*) AS BIGINT) AS n_cur,
         |    CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_below,
         |    CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_above
         |  FROM c GROUP BY 1, 2, 3, 4)
         |SELECT k AS event_type, known_key, lo_micro, hi_micro, n_cur,
         |  n_below, n_above,
         |  CAST(((n_below + n_above) * 1000000) // n_cur AS BIGINT)
         |    AS viol_ppm,
         |  (NOT known_key OR n_below + n_above > 0) AS flagged
         |FROM a ORDER BY event_type""".stripMargin)
}
