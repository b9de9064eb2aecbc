package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** Round-8 part thirteen: raking (iterative proportional fitting) of
  * the lang×source cell table and the ESS weight diagnostic.
  */
object Round8mQueries {

  /** IPF rounds (unrolled in the oracle). */
  val RakeRounds = 2

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reweight the corpus so language mass is EQUAL while source mass
    // stays observed — two IPF rounds on the micro-mass grid.
    "q255_rake_weights" -> ((s, dir) =>
      Mixture.rakeWeights(Tables.load(s, dir, "documents"),
        "lang", "source", RakeRounds)),

    // How many effective documents the raked weights retain.
    "q256_weight_ess" -> ((s, dir) =>
      Mixture.weightEss(
        Mixture.rakeWeights(Tables.load(s, dir, "documents"),
          "lang", "source", RakeRounds),
        "n", "weight_micro")))

  /** The raked cell table, shared by both oracles. */
  private val RakeSql = {
    def round(i: Int, prev: String): String =
      s"""r${i}a AS (SELECT r, c, n, t_row, t_col,
         |    (w * t_row) // (sum(w) OVER (PARTITION BY r)) AS w
         |  FROM $prev),
         |r${i}b AS (SELECT r, c, n, t_row, t_col,
         |    (w * t_col) // (sum(w) OVER (PARTITION BY c)) AS w
         |  FROM r${i}a)""".stripMargin
    s"""cen AS (SELECT lang AS r, source AS c,
       |    CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2),
       |nr AS (SELECT CAST(count(DISTINCT r) AS HUGEINT) AS n_row_keys
       |  FROM cen),
       |base AS (SELECT r, c, n, CAST(n AS HUGEINT) * 1000000 AS w,
       |    sum(CAST(n AS HUGEINT) * 1000000) OVER () AS total_mass,
       |    sum(CAST(n AS HUGEINT) * 1000000) OVER (PARTITION BY c)
       |      AS t_col
       |  FROM cen),
       |b2 AS (SELECT r, c, n, w, t_col,
       |    total_mass // n_row_keys AS t_row FROM base, nr),
       |${round(1, "b2")},
       |${round(2, "r1b")},
       |rk AS (SELECT r AS lang, c AS source, n,
       |    CAST(w AS BIGINT) AS weight_micro,
       |    CAST((sum(w) OVER (PARTITION BY r) * 1000000) //
       |      (sum(w) OVER ()) AS BIGINT) AS w_row_ppm
       |  FROM r2b)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q255_rake_weights" ->
      s"""WITH $RakeSql
         |SELECT lang, source, n, weight_micro, w_row_ppm
         |FROM rk ORDER BY lang, source""".stripMargin,

    "q256_weight_ess" ->
      s"""WITH $RakeSql,
         |agg AS (SELECT CAST(sum(n) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(sum(CAST(weight_micro AS HUGEINT)) AS HUGEINT)
         |      AS sum_w,
         |    CAST(sum((CAST(weight_micro AS HUGEINT) * weight_micro)
         |      // n) AS HUGEINT) AS sq_per
         |  FROM rk)
         |SELECT n, n_cells, CAST(sum_w AS BIGINT) AS sum_w_micro,
         |  CASE WHEN sq_per > 0 THEN
         |    round(sum_w::DOUBLE * sum_w::DOUBLE / sq_per::DOUBLE, 6)
         |  END AS ess,
         |  CASE WHEN sq_per > 0 AND n > 0 THEN
         |    CAST(((sum_w * sum_w // sq_per) * 1000000) // n
         |      AS BIGINT)
         |  END AS ess_ratio_ppm
         |FROM agg""".stripMargin)
}
