package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, Experiment}

/** Round-6 part thirty: minimum-detectable-effect sizing and the
  * pairwise Welch post-hoc matrix behind q145's ANOVA.
  */
object Round7cQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_mde" -> ((s, dir) => {
      val units = Tables.load(s, dir, "events")
        .groupBy(col("user_id").as("u"))
        .agg(max(col("event_type") === "purchase" &&
          col("value") > Round6pQueries.ConvMinValue).as("success"))
        .select(pmod(col("u"), lit(2L)).as("arm"), col("success"))
      Experiment.mdeReport(units)
    }),

    "q197_pairwise_welch" -> ((s, dir) =>
      Correlate.pairwiseWelch(Tables.load(s, dir, "events"),
        "event_type", "value")))

  val oracleSql: Map[String, String] = Map(
    "q196_mde" -> {
      val z = (Experiment.ZAlphaMicro + Experiment.ZPowerMicro).toDouble / 1e6
      s"""WITH u AS (SELECT user_id AS u,
         |    max(CASE WHEN event_type = 'purchase'
         |      AND value > ${Round6pQueries.ConvMinValue}
         |      THEN 1 ELSE 0 END) AS s
         |  FROM events GROUP BY 1),
         |a AS (SELECT
         |    CAST(sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_ctrl,
         |    CAST(sum(CASE WHEN u % 2 = 0 THEN s ELSE 0 END) AS BIGINT)
         |      AS conv_ctrl,
         |    CAST(sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_treat,
         |    CAST(sum(CASE WHEN u % 2 = 1 THEN s ELSE 0 END) AS BIGINT)
         |      AS conv_treat
         |  FROM u),
         |e AS (SELECT *,
         |    (conv_ctrl + conv_treat)::DOUBLE / (n_ctrl + n_treat)
         |      AS pooled FROM a)
         |SELECT n_ctrl, n_treat, conv_ctrl, conv_treat,
         |  CAST(((conv_ctrl + conv_treat) * 1000000) //
         |    (n_ctrl + n_treat) AS BIGINT) AS baseline_ppm,
         |  CASE WHEN n_ctrl > 0 AND n_treat > 0 AND pooled > 0
         |      AND pooled < 1 THEN
         |    round($z * sqrt(pooled * (1.0 - pooled) *
         |      (1.0 / n_ctrl + 1.0 / n_treat)), 6) END AS mde_abs
         |FROM e""".stripMargin
    },

    "q197_pairwise_welch" ->
      """WITH s AS (SELECT event_type AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(value * 1e3) AS BIGINT)) AS BIGINT) AS s,
        |    sum(CAST(round(value * 1e3) AS BIGINT) *
        |      CAST(round(value * 1e3) AS BIGINT)) AS q
        |  FROM events GROUP BY 1),
        |v AS (SELECT g, n, s, CASE WHEN n > 1 THEN CAST(round(
        |    CAST(n * q - s::HUGEINT * s AS DOUBLE) /
        |    (n::DOUBLE * (n - 1))) AS BIGINT) END AS v FROM s),
        |p AS (SELECT a.g AS group_a, b.g AS group_b,
        |    a.n AS n_a, b.n AS n_b, a.s AS s_a, b.s AS s_b,
        |    a.v AS v_a_milli2, b.v AS v_b_milli2
        |  FROM v a JOIN v b ON a.g < b.g),
        |e AS (SELECT *, v_a_milli2::DOUBLE / n_a AS se1,
        |    v_b_milli2::DOUBLE / n_b AS se2 FROM p)
        |SELECT group_a, group_b, n_a, n_b, v_a_milli2, v_b_milli2,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND se1 + se2 > 0 THEN
        |    round((s_a::DOUBLE / n_a - s_b::DOUBLE / n_b) /
        |      sqrt(se1 + se2), 6) END AS t_stat,
        |  CASE WHEN n_a > 1 AND n_b > 1 AND se1 + se2 > 0 THEN
        |    round(((se1 + se2) * (se1 + se2)) /
        |      ((se1 * se1) / (n_a - 1) + (se2 * se2) / (n_b - 1)), 3)
        |  END AS df_w
        |FROM e ORDER BY group_a, group_b""".stripMargin)
}
