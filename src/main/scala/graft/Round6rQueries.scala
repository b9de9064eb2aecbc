package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Concentration, Experiment, Graph}

/** Round-6 part nineteen: Shannon diversity / effective categories,
  * degree assortativity, and a CUPED variance-reduced experiment
  * readout.
  */
object Round6rQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Language-mix balance per source: entropy, effective language
    // count, Pielou evenness.
    "q176_diversity" -> ((s, dir) =>
      Concentration.diversityReport(Tables.load(s, dir, "documents"),
        "source", "lang")),

    // Hubs-link-to-hubs? over the capped co-purchase graph.
    "q177_assortativity" -> ((s, dir) =>
      Graph.assortativityReport(
        Graph.coOccurrenceEdges(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey",
          maxGroupSize = Some(Round6bQueries.CoPurchaseCap)))),

    // CUPED over the q98 cut: pre-period spend as each user's own
    // covariate; deterministic user-parity arms.
    "q178_cuped" -> ((s, dir) =>
      Experiment.cupedReport(Tables.load(s, dir, "events"),
        col("ts") < lit(Round5fQueries.PsiCutoff).cast("timestamp"),
        pmod(col("u"), lit(2L)))))

  val oracleSql: Map[String, String] = Map(
    "q176_diversity" ->
      """WITH c AS (SELECT source AS g, lang AS cat, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS k FROM c),
        |s AS (SELECT g, n, k,
        |    CAST(sum(CAST(round(-(c / n) * ln(c / n) * 1e9) AS BIGINT))
        |      AS BIGINT) AS h_nano
        |  FROM w GROUP BY 1, 2, 3)
        |SELECT g AS source, n AS n_rows, k AS n_cats, h_nano,
        |  round(exp(h_nano / 1e9), 6) AS eff_cats,
        |  CASE WHEN k > 1 THEN
        |    round((h_nano / 1e9) / ln(k::DOUBLE), 6) END AS evenness
        |FROM s ORDER BY source""".stripMargin,

    "q177_assortativity" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
         |  FROM lineitem),
         |hot AS (SELECT g FROM li GROUP BY g
         |  HAVING count(*) > ${Round6bQueries.CoPurchaseCap}),
         |lic AS (SELECT * FROM li WHERE g NOT IN (SELECT g FROM hot)),
         |e0 AS (SELECT a.it AS na, b.it AS nb FROM lic a
         |  JOIN lic b ON a.g = b.g AND a.it < b.it GROUP BY 1, 2),
         |ed AS (SELECT na AS src, nb AS dst FROM e0
         |  UNION ALL SELECT nb, na FROM e0),
         |dg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |  FROM ed GROUP BY 1),
         |p AS (SELECT a.deg AS dx, b.deg AS dy FROM ed
         |  JOIN dg a ON a.node = ed.src JOIN dg b ON b.node = ed.dst),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         |    sum(dx * dy) AS sxy, sum(dx * dx) AS sxx,
         |    sum(dy * dy) AS syy FROM p)
         |SELECT m AS m_directed, sx AS sum_dx, sy AS sum_dy,
         |  CASE WHEN (m * sxx - sx * sx) > 0 AND (m * syy - sy * sy) > 0
         |    THEN round(CAST(m * sxy - sx * sy AS DOUBLE) /
         |      sqrt(CAST(m * sxx - sx * sx AS DOUBLE) *
         |        CAST(m * syy - sy * sy AS DOUBLE)), 6)
         |  END AS assortativity
         |FROM s""".stripMargin,

    "q178_cuped" ->
      s"""WITH u AS (SELECT user_id AS u,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '${Round5fQueries.PsiCutoff}'
         |      THEN CAST(round(value * 1e3) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '${Round5fQueries.PsiCutoff}'
         |      THEN 0 ELSE CAST(round(value * 1e3) AS BIGINT) END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    sum(x * y) AS sxy, sum(x * x) AS sxx FROM u),
         |t AS (SELECT *, CASE WHEN (n * sxx - sx * sx) > 0 THEN
         |      CAST(n * sxy - sx * sy AS DOUBLE) /
         |        CAST(n * sxx - sx * sx AS DOUBLE)
         |    ELSE 0 END AS theta FROM g),
         |a AS (SELECT u % 2 AS arm, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(sum(y) AS BIGINT) AS sum_y_milli,
         |    CAST(sum(x) AS BIGINT) AS sum_x_milli FROM u GROUP BY 1)
         |SELECT a.arm, a.n_users, a.sum_y_milli, a.sum_x_milli,
         |  round(a.sum_y_milli::DOUBLE / a.n_users, 6) AS mean_y_milli,
         |  round(a.sum_y_milli::DOUBLE / a.n_users -
         |    t.theta * (a.sum_x_milli::DOUBLE / a.n_users -
         |      t.sx::DOUBLE / t.n), 6) AS adj_mean_y_milli,
         |  round(t.theta, 6) AS theta
         |FROM a, t ORDER BY arm""".stripMargin)
}
