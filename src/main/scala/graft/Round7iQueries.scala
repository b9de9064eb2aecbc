package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, SkewReport}

/** Round-7 part four: join-cardinality forecasting and
  * group-sequential (peeking-correct) experiment monitoring.
  */
object Round7iQueries {

  val JoinSizeTopN = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact |L ⋈ R| forecast + top exploding keys from the two key
    // censuses — the pre-join guard; no data-side join runs.
    "q201_join_size" -> ((s, dir) =>
      SkewReport.joinSizeReport(Tables.load(s, dir, "events"),
        Tables.load(s, dir, "orders"), "user_id", "o_custkey",
        JoinSizeTopN)),

    // Group-sequential conversion monitor: the q193 unit grain with a
    // deterministic peek index; cumulative z vs frozen O'Brien-Fleming
    // boundaries answers "when could this test have stopped".
    "q203_group_sequential" -> ((s, dir) => {
      val units = Tables.load(s, dir, "events")
        .groupBy(col("user_id").as("u"))
        .agg(max(col("event_type") === "purchase" &&
          col("value") > Round6pQueries.ConvMinValue).as("success"))
        .select(pmod(col("u"), lit(2L)).as("arm"),
          (pmod(expr("u div 2"), lit(4L)) + 1).as("peek"),
          col("success"))
      Experiment.groupSequentialZ(units, "peek")
    }))

  val oracleSql: Map[String, String] = Map(
    "q201_join_size" ->
      s"""WITH cl AS (SELECT user_id::VARCHAR AS key,
         |    CAST(count(*) AS BIGINT) AS n_left FROM events GROUP BY 1),
         |cr AS (SELECT o_custkey::VARCHAR AS key,
         |    CAST(count(*) AS BIGINT) AS n_right FROM orders GROUP BY 1),
         |j AS (SELECT key, n_left, n_right,
         |    CAST(n_left * n_right AS BIGINT) AS out_rows
         |  FROM cl JOIN cr USING (key)),
         |t AS (SELECT '__all' AS key, CAST(sum(n_left) AS BIGINT)
         |      AS n_left,
         |    CAST(sum(n_right) AS BIGINT) AS n_right,
         |    CAST(sum(out_rows) AS BIGINT) AS out_rows FROM j),
         |tp AS (SELECT * FROM j
         |  ORDER BY out_rows DESC, key LIMIT $JoinSizeTopN)
         |SELECT * FROM (SELECT * FROM t UNION ALL SELECT * FROM tp)
         |ORDER BY (key <> '__all'), out_rows DESC, key""".stripMargin,

    "q203_group_sequential" -> {
      val b = Experiment.ObfBoundaryMicro
      s"""WITH u AS (SELECT user_id AS u,
         |    CAST(max(CASE WHEN event_type = 'purchase'
         |      AND value > ${Round6pQueries.ConvMinValue} THEN 1 ELSE 0
         |      END) AS BIGINT) AS s
         |  FROM events GROUP BY 1),
         |seg AS (SELECT u % 2 AS arm, ((u // 2) % 4) + 1 AS peek, s
         |  FROM u),
         |pp AS (SELECT peek,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS dn0,
         |    CAST(sum(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT)
         |      AS dk0,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS dn1,
         |    CAST(sum(CASE WHEN arm = 1 THEN s ELSE 0 END) AS BIGINT)
         |      AS dk1
         |  FROM seg GROUP BY 1),
         |c AS (SELECT CAST(peek AS INTEGER) AS peek,
         |    CAST(sum(dn0) OVER w AS BIGINT) AS n_ctrl,
         |    CAST(sum(dk0) OVER w AS BIGINT) AS conv_ctrl,
         |    CAST(sum(dn1) OVER w AS BIGINT) AS n_treat,
         |    CAST(sum(dk1) OVER w AS BIGINT) AS conv_treat
         |  FROM pp WINDOW w AS (ORDER BY peek
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |e AS (SELECT *,
         |    (conv_ctrl + conv_treat)::DOUBLE / (n_ctrl + n_treat)
         |      AS pooled FROM c),
         |f AS (SELECT peek, n_ctrl, conv_ctrl, n_treat, conv_treat,
         |    CASE WHEN n_ctrl > 0 AND n_treat > 0 AND pooled > 0
         |        AND pooled < 1 THEN
         |      round((conv_treat::DOUBLE / n_treat -
         |        conv_ctrl::DOUBLE / n_ctrl) /
         |        sqrt(pooled * (1.0 - pooled) *
         |          (1.0 / n_ctrl + 1.0 / n_treat)), 6) END AS z,
         |    CASE peek WHEN 1 THEN ${b(0)} WHEN 2 THEN ${b(1)}
         |      WHEN 3 THEN ${b(2)} WHEN 4 THEN ${b(3)} END
         |      AS boundary_micro
         |  FROM e),
         |g AS (SELECT *, coalesce(CAST(round(abs(z) * 1e6) AS BIGINT)
         |      >= boundary_micro, false) AS crossed FROM f)
         |SELECT *, CAST(min(CASE WHEN crossed THEN peek END) OVER ()
         |    AS INTEGER) AS first_cross_peek
         |FROM g ORDER BY peek""".stripMargin
    })
}
