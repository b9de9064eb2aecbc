package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Concentration, Experiment}

/** Round-6 part twenty-nine: difference-in-differences readout and the
  * jackknife leave-one-source-out influence audit.
  */
object Round7bQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q194_did" -> ((s, dir) =>
      Experiment.didReport(Tables.load(s, dir, "events"),
        pmod(col("user_id"), lit(2L)),
        col("ts") < lit(Round5fQueries.PsiCutoff).cast("timestamp"))),

    "q195_source_influence" -> ((s, dir) =>
      Concentration.influenceReport(Tables.load(s, dir, "documents"),
        "source", "n_chars")))

  val oracleSql: Map[String, String] = Map(
    "q194_did" -> {
      val pre = s"ts < TIMESTAMP '${Round5fQueries.PsiCutoff}'"
      def n(arm: Int, preSide: Boolean, suf: String) = {
        val cond = s"user_id % 2 = $arm AND ${if (preSide) pre else s"NOT ($pre)"}"
        s"""CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_$suf,
           |  CAST(sum(CASE WHEN $cond THEN CAST(round(value * 1e3)
           |    AS BIGINT) ELSE 0 END) AS BIGINT) AS s_$suf""".stripMargin
      }
      s"""WITH a AS (SELECT
         |  ${n(0, preSide = true, "c_pre")},
         |  ${n(0, preSide = false, "c_post")},
         |  ${n(1, preSide = true, "t_pre")},
         |  ${n(1, preSide = false, "t_post")}
         |  FROM events)
         |SELECT n_c_pre, s_c_pre, n_c_post, s_c_post,
         |  n_t_pre, s_t_pre, n_t_post, s_t_post,
         |  round(s_c_pre::DOUBLE / n_c_pre, 6) AS mean_c_pre,
         |  round(s_c_post::DOUBLE / n_c_post, 6) AS mean_c_post,
         |  round(s_t_pre::DOUBLE / n_t_pre, 6) AS mean_t_pre,
         |  round(s_t_post::DOUBLE / n_t_post, 6) AS mean_t_post,
         |  round((s_t_post::DOUBLE / n_t_post -
         |    s_t_pre::DOUBLE / n_t_pre) -
         |    (s_c_post::DOUBLE / n_c_post -
         |      s_c_pre::DOUBLE / n_c_pre), 6) AS did_milli
         |FROM a""".stripMargin
    },

    "q195_source_influence" ->
      """WITH g AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(CAST(round(n_chars * 1e3) AS BIGINT)) AS BIGINT)
        |      AS s_g
        |  FROM documents GROUP BY 1),
        |w AS (SELECT *, CAST(sum(n_g) OVER () AS BIGINT) AS n_all,
        |    CAST(sum(s_g) OVER () AS BIGINT) AS s_all FROM g),
        |e AS (SELECT *, round(s_all::DOUBLE / n_all, 6) AS mean_all,
        |    CASE WHEN n_all > n_g THEN
        |      round((s_all - s_g)::DOUBLE / (n_all - n_g), 6) END
        |      AS mean_wo FROM w)
        |SELECT g AS source, n_g, s_g AS s_g_milli,
        |  mean_all AS mean_all_milli, mean_wo AS mean_wo_milli,
        |  CASE WHEN n_all > n_g THEN round(mean_all - mean_wo, 6) END
        |    AS influence_milli
        |FROM e ORDER BY source""".stripMargin)
}
