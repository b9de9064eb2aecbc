package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Privacy, Survival}

/** Round-7 part five: uplift-by-score-bin (the Qini reading), the
  * t-closeness privacy rung, and the log-rank survival test.
  */
object Round7jQueries {

  val TClosenessMilli = 200L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Who responds to treatment: per-user activity count as the
    // targeting score, q193's conversion as outcome, parity arms.
    "q204_uplift_bins" -> ((s, dir) => {
      val units = Tables.load(s, dir, "events")
        .groupBy(col("user_id").as("u"))
        .agg(count(lit(1)).as("score"),
          max(col("event_type") === "purchase" &&
            col("value") > Round6pQueries.ConvMinValue).as("success"))
        .select(col("score"), pmod(col("u"), lit(2L)).as("arm"),
          col("success"))
      Experiment.upliftByDecile(units, "score")
    }),

    // Skewness-attack audit: does any nation's market-segment mix
    // differ from the table's by more than 200 milli TV?
    "q205_t_closeness" -> ((s, dir) =>
      Privacy.tClosenessReport(Tables.load(s, dir, "customer"),
        Seq("c_nationkey"), "c_mktsegment", TClosenessMilli)),

    // Do even- and odd-user populations reach their first severe
    // error at different rates? (q160's lifetime model, two arms.)
    "q206_log_rank" -> ((s, dir) =>
      Survival.logRank(Tables.load(s, dir, "events"),
        col("event_type") === "error" && col("value") > 150,
        col("user_id") % 2 === 0)))

  val oracleSql: Map[String, String] = Map(
    "q204_uplift_bins" ->
      s"""WITH u AS (SELECT user_id AS u, CAST(count(*) AS BIGINT) AS sc,
         |    CAST(max(CASE WHEN event_type = 'purchase'
         |      AND value > ${Round6pQueries.ConvMinValue} THEN 1 ELSE 0
         |      END) AS BIGINT) AS s
         |  FROM events GROUP BY 1),
         |bd AS (SELECT min(sc) AS mn, max(sc) AS mx FROM u),
         |v AS (SELECT ((sc - mn) * 10) // (mx - mn + 1) AS bin,
         |    u % 2 AS arm, s FROM u, bd),
         |p AS (SELECT bin,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_ctrl,
         |    CAST(sum(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT)
         |      AS conv_ctrl,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_treat,
         |    CAST(sum(CASE WHEN arm = 1 THEN s ELSE 0 END) AS BIGINT)
         |      AS conv_treat
         |  FROM v GROUP BY 1),
         |c AS (SELECT *,
         |    CAST(sum(n_ctrl) OVER w AS BIGINT) AS cum_n_ctrl,
         |    CAST(sum(conv_ctrl) OVER w AS BIGINT) AS cum_k_ctrl,
         |    CAST(sum(n_treat) OVER w AS BIGINT) AS cum_n_treat,
         |    CAST(sum(conv_treat) OVER w AS BIGINT) AS cum_k_treat
         |  FROM p WINDOW w AS (ORDER BY bin DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT bin, n_ctrl, conv_ctrl, n_treat, conv_treat,
         |  (CASE WHEN n_treat > 0 THEN (conv_treat * 1000000) // n_treat
         |     END -
         |   CASE WHEN n_ctrl > 0 THEN (conv_ctrl * 1000000) // n_ctrl
         |     END) AS uplift_ppm,
         |  cum_n_treat,
         |  (CASE WHEN cum_n_treat > 0 THEN
         |     (cum_k_treat * 1000000) // cum_n_treat END -
         |   CASE WHEN cum_n_ctrl > 0 THEN
         |     (cum_k_ctrl * 1000000) // cum_n_ctrl END) AS cum_uplift_ppm
         |FROM c ORDER BY bin DESC""".stripMargin,

    "q205_t_closeness" ->
      s"""WITH cen AS (SELECT c_nationkey AS q, c_mktsegment AS v,
         |    CAST(count(*) AS BIGINT) AS c FROM customer GROUP BY 1, 2),
         |g AS (SELECT v, CAST(sum(c) AS BIGINT) AS gv FROM cen
         |  GROUP BY 1),
         |nt AS (SELECT CAST(sum(c) AS BIGINT) AS ntot FROM cen),
         |nc AS (SELECT q, CAST(sum(c) AS BIGINT) AS nrows FROM cen
         |  GROUP BY 1),
         |j AS (SELECT cen.q,
         |    sum(abs(CAST(cen.c AS HUGEINT) * nt.ntot -
         |      CAST(g.gv AS HUGEINT) * nc.nrows)) AS present,
         |    CAST(sum(g.gv) AS BIGINT) AS gp
         |  FROM cen JOIN g USING (v) CROSS JOIN nt
         |    JOIN nc ON nc.q = cen.q
         |  GROUP BY cen.q),
         |f AS (SELECT j.q, nc.nrows AS n_rows,
         |    CAST(((j.present + CAST(nc.nrows AS HUGEINT) *
         |      (nt.ntot - j.gp)) * 500) //
         |      (CAST(nc.nrows AS HUGEINT) * nt.ntot) AS BIGINT)
         |      AS tv_milli
         |  FROM j JOIN nc ON nc.q = j.q CROSS JOIN nt)
         |SELECT q AS c_nationkey, n_rows, tv_milli,
         |  tv_milli > $TClosenessMilli AS t_violation
         |FROM f ORDER BY c_nationkey""".stripMargin,

    "q206_log_rank" ->
      """WITH u AS (SELECT user_id AS u,
        |    min(date_trunc('day', ts)::DATE) AS entry,
        |    min(CASE WHEN event_type = 'error' AND value > 150
        |      THEN date_trunc('day', ts)::DATE END) AS event_day,
        |    max(user_id % 2 = 0) AS is_a
        |  FROM events GROUP BY 1),
        |b AS (SELECT max(date_trunc('day', ts)::DATE) AS horizon
        |  FROM events),
        |lt AS (SELECT CAST(CASE WHEN event_day IS NOT NULL
        |      THEN event_day - entry ELSE horizon - entry END AS BIGINT)
        |      AS t,
        |    event_day IS NOT NULL AS observed, is_a FROM u, b),
        |cs AS (SELECT t,
        |    sum(CASE WHEN observed AND is_a THEN 1 ELSE 0 END) AS d1,
        |    sum(CASE WHEN observed AND NOT is_a THEN 1 ELSE 0 END) AS d2,
        |    sum(CASE WHEN NOT observed AND is_a THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN NOT observed AND NOT is_a THEN 1 ELSE 0 END)
        |      AS c2
        |  FROM lt GROUP BY t),
        |w AS (SELECT *,
        |    CAST(sum(d1 + c1) OVER () AS BIGINT) AS na_tot,
        |    CAST(sum(d2 + c2) OVER () AS BIGINT) AS nb_tot,
        |    CAST(sum(d1 + c1) OVER () - coalesce(sum(d1 + c1)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING), 0) AS BIGINT) AS n1,
        |    CAST(sum(d2 + c2) OVER () - coalesce(sum(d2 + c2)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING), 0) AS BIGINT) AS n2
        |  FROM cs),
        |r AS (SELECT *, n1 + n2 AS n, d1 + d2 AS d FROM w
        |  WHERE d1 + d2 > 0 AND n1 > 0 AND n2 > 0 AND n1 + n2 > 1),
        |k AS (SELECT na_tot, nb_tot, d1, d2,
        |    CAST(round((d1 - d::DOUBLE * n1 / n) * 1e9) AS BIGINT)
        |      AS ome_nano,
        |    CAST(round(d::DOUBLE * (n1::DOUBLE / n) * (n2::DOUBLE / n) *
        |      ((n - d)::DOUBLE / (n - 1)) * 1e9) AS BIGINT) AS v_nano
        |  FROM r)
        |SELECT na_tot AS n_a, nb_tot AS n_b,
        |  CAST(sum(d1) AS BIGINT) AS events_a,
        |  CAST(sum(d2) AS BIGINT) AS events_b,
        |  CASE WHEN sum(v_nano) > 0 THEN
        |    round((sum(ome_nano)::DOUBLE / 1e9) *
        |      (sum(ome_nano)::DOUBLE / 1e9) /
        |      (sum(v_nano)::DOUBLE / 1e9), 6) END AS chi2
        |FROM k GROUP BY na_tot, nb_tot""".stripMargin)
}
