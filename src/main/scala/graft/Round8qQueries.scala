package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Preference

/** Round-8 part seventeen: Cronbach's α — internal consistency of a
  * multi-item score.
  */
object Round8qQueries {

  val CaItems = Seq("click", "error", "purchase", "signup", "view")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Do a user's five per-type value totals cohere into one "scale"
    // — the reliability read over the complete-case user panel.
    "q260_cronbach_alpha" -> ((s, dir) =>
      Preference.cronbachAlpha(Tables.load(s, dir, "events"),
        "user_id", "event_type", "value", CaItems)))

  val oracleSql: Map[String, String] = Map(
    "q260_cronbach_alpha" -> {
      val itemsSql = CaItems.map(i => s"'$i'").mkString("(", ", ", ")")
      val k = CaItems.size
      s"""WITH cells AS (SELECT user_id AS u, event_type AS it,
         |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
         |      AS s
         |  FROM events WHERE event_type IN $itemsSql GROUP BY 1, 2),
         |complete AS (SELECT cells.* FROM cells JOIN (SELECT u
         |    FROM cells GROUP BY u HAVING count(*) = $k) c
         |  USING (u)),
         |pi AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |    CAST(max(n) AS BIGINT) AS n_units,
         |    CAST(sum(CAST(n AS HUGEINT) * sxx - sx * sx) AS HUGEINT)
         |      AS v_items
         |  FROM (SELECT it, CAST(count(*) AS BIGINT) AS n,
         |      CAST(sum(CAST(s AS HUGEINT)) AS HUGEINT) AS sx,
         |      CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS sxx
         |    FROM complete GROUP BY 1)),
         |tv AS (SELECT CAST(CAST(n_t AS HUGEINT) * stt - st * st
         |      AS HUGEINT) AS v_tot
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS n_t,
         |      CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS st,
         |      CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt
         |    FROM (SELECT u, CAST(sum(s) AS BIGINT) AS t
         |      FROM complete GROUP BY 1)))
         |SELECT n_units, n_items,
         |  CASE WHEN v_tot > 0 THEN
         |    round(($k.0 / ${k - 1}.0) *
         |      (1.0 - v_items::DOUBLE / v_tot::DOUBLE), 6)
         |  END AS alpha
         |FROM pi, tv""".stripMargin
    })
}
