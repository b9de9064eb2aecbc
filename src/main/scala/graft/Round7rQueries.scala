package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, Graph}

/** Round-7 part thirteen: k-core graph peeling and Spearman rank
  * correlation.
  */
object Round7rQueries {

  val CoreK = 70L
  val CoreRounds = 7

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Resilient backbone of the co-purchase graph: nodes surviving
    // repeated degree-<k peels (the q129 edge relation).
    "q216_kcore" -> ((s, dir) =>
      Graph.kCoreReport(Round6bQueries.coPurchase(s, dir), CoreK,
        CoreRounds)),

    // Monotone dependence between a user's activity volume and spend
    // (value-domain ranks, tie-averaged).
    "q217_spearman" -> ((s, dir) => {
      val u = Tables.load(s, dir, "events")
        .groupBy(col("user_id").as("u"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("spend_cents"))
      Correlate.spearman(u, "n_events", "spend_cents")
    }))

  /** One peel round. Every CTE is AS MATERIALIZED: each one is
    * referenced twice, and DuckDB 1.0 inlines multiply-referenced
    * CTEs — 7 chained rounds would otherwise expand exponentially.
    */
  private def peelSql(k: Int): String =
    s"""kp$k AS MATERIALIZED (SELECT src FROM ec${k - 1} GROUP BY src
       |  HAVING count(*) >= $CoreK),
       |ec$k AS MATERIALIZED (SELECT e.src, e.dst FROM ec${k - 1} e
       |  JOIN kp$k a ON a.src = e.src
       |  JOIN kp$k b ON b.src = e.dst)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q216_kcore" -> {
      val peels = (1 to CoreRounds).map(peelSql).mkString(",\n")
      s"""WITH ${Round6bQueries.edgesSql},
         |ec0 AS MATERIALIZED (SELECT src, dst FROM ed),
         |$peels,
         |d0 AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree0
         |  FROM ec0 GROUP BY 1),
         |fd AS (SELECT src AS node, CAST(count(*) AS BIGINT)
         |    AS final_degree FROM ec$CoreRounds GROUP BY 1)
         |SELECT d0.node, d0.degree0, fd.node IS NOT NULL AS survives,
         |  fd.final_degree
         |FROM d0 LEFT JOIN fd ON fd.node = d0.node
         |ORDER BY d0.node""".stripMargin
    },

    "q217_spearman" ->
      """WITH u AS (SELECT user_id AS u,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |cc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM u
        |  GROUP BY 1, 2),
        |rx AS (SELECT x, 2 * coalesce(sum(t) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS rx2
        |  FROM (SELECT x, CAST(sum(c) AS BIGINT) AS t FROM cc
        |    GROUP BY x)),
        |ry AS (SELECT y, 2 * coalesce(sum(t) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS ry2
        |  FROM (SELECT y, CAST(sum(c) AS BIGINT) AS t FROM cc
        |    GROUP BY y)),
        |s AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(sum(CAST(c AS HUGEINT) * rx2) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(c AS HUGEINT) * ry2) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(c AS HUGEINT) * rx2 * rx2) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(c AS HUGEINT) * ry2 * ry2) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(c AS HUGEINT) * rx2 * ry2) AS HUGEINT) AS sxy
        |  FROM cc JOIN rx USING (x) JOIN ry USING (y))
        |SELECT n, n_cells,
        |  CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      > 0 AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
        |      > 0 THEN
        |    round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |      sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
        |        (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
        |    END AS rho
        |FROM s""".stripMargin)
}
