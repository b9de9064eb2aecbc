package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Experiment

/** Round-6 part twenty-eight: two-proportion z readout with segment
  * decomposition (the binary-outcome third leg of the experiment
  * family, and a one-table Simpson's-paradox detector).
  */
object Round7Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q193_proportion_z" -> ((s, dir) => {
      val units = Tables.load(s, dir, "events")
        .groupBy(col("user_id").as("u"))
        .agg(max(col("event_type") === "purchase" &&
          col("value") > Round6pQueries.ConvMinValue).as("success"))
        .select(col("u"), pmod(col("u"), lit(2L)).as("arm"),
          col("success"), pmod(col("u"), lit(3L)).as("segment"))
      Experiment.proportionZ(units)
    }))

  val oracleSql: Map[String, String] = Map(
    "q193_proportion_z" ->
      s"""WITH u AS (SELECT user_id AS u,
         |    CAST(max(CASE WHEN event_type = 'purchase'
         |      AND value > ${Round6pQueries.ConvMinValue} THEN 1 ELSE 0
         |      END) AS BIGINT) AS s
         |  FROM events GROUP BY 1),
         |seg AS (SELECT (u % 3)::VARCHAR AS segment, u % 2 AS arm, s
         |    FROM u
         |  UNION ALL SELECT '__all', u % 2, s FROM u),
         |a AS (SELECT segment,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_ctrl,
         |    CAST(sum(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT)
         |      AS conv_ctrl,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_treat,
         |    CAST(sum(CASE WHEN arm = 1 THEN s ELSE 0 END) AS BIGINT)
         |      AS conv_treat
         |  FROM seg GROUP BY 1),
         |e AS (SELECT *,
         |    (conv_ctrl + conv_treat)::DOUBLE / (n_ctrl + n_treat)
         |      AS pooled FROM a)
         |SELECT segment, n_ctrl, conv_ctrl, n_treat, conv_treat,
         |  CAST((conv_ctrl * 1000000) // n_ctrl AS BIGINT)
         |    AS rate_ctrl_ppm,
         |  CAST((conv_treat * 1000000) // n_treat AS BIGINT)
         |    AS rate_treat_ppm,
         |  CAST((conv_treat * 1000000) // n_treat -
         |    (conv_ctrl * 1000000) // n_ctrl AS BIGINT) AS diff_ppm,
         |  CASE WHEN n_ctrl > 0 AND n_treat > 0 AND pooled > 0
         |      AND pooled < 1 THEN
         |    round((conv_treat::DOUBLE / n_treat -
         |      conv_ctrl::DOUBLE / n_ctrl) /
         |      sqrt(pooled * (1.0 - pooled) *
         |        (1.0 / n_ctrl + 1.0 / n_treat)), 6) END AS z
         |FROM e ORDER BY segment""".stripMargin)
}
