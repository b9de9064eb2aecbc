package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, ProfileDrift}

/** Round-6 part twenty-three: multi-column KS drift suite (one scan per
  * side for ALL monitored columns) and the covariate-balance SMD audit
  * that gates the q178 CUPED readout.
  */
object Round6vQueries {

  /** q184 monitors the four lineitem numeric columns across a
    * ship-date cut.
    */
  val DriftCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  val ShipCutoff = "1998-01-01"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q184_ks_suite" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val cut = lit(ShipCutoff).cast("timestamp")
      ProfileDrift.ksSuite(li.filter(col("l_shipdate") < cut),
        li.filter(col("l_shipdate") >= cut), DriftCols)
    }),

    // SMD at the conventional 0.1 flag: 2 of 5 features balanced at
    // sf0.01 under parity arms — binds both ways.
    "q185_covariate_balance" -> ((s, dir) =>
      Experiment.covariateBalance(Tables.load(s, dir, "events"),
        pmod(col("u"), lit(2L)))))

  val oracleSql: Map[String, String] = Map(
    "q184_ks_suite" -> {
      val melt = DriftCols.map(c =>
        s"SELECT '$c' AS f, $c AS value, l_shipdate FROM lineitem")
        .mkString(" UNION ALL ")
      s"""WITH m AS ($melt),
         |v AS (SELECT f AS g, CAST(round(value * 1e6) AS BIGINT) AS vm,
         |    CASE WHEN l_shipdate < TIMESTAMP '$ShipCutoff'
         |      THEN 1 ELSE 0 END AS isref FROM m),
         |h AS (SELECT g, vm, sum(isref) AS c_ref, sum(1 - isref) AS c_cur
         |  FROM v GROUP BY 1, 2),
         |w AS (SELECT *,
         |    sum(c_ref) OVER (PARTITION BY g ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
         |    sum(c_cur) OVER (PARTITION BY g ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cur,
         |    CAST(sum(c_ref) OVER (PARTITION BY g) AS BIGINT) AS n_ref,
         |    CAST(sum(c_cur) OVER (PARTITION BY g) AS BIGINT) AS n_cur
         |  FROM h),
         |d AS (SELECT *, abs(cum_ref * n_cur - cum_cur * n_ref) AS dd
         |  FROM w),
         |mm AS (SELECT *, max(dd) OVER (PARTITION BY g) AS d_max FROM d)
         |SELECT g AS feature, n_ref, n_cur,
         |  CAST(max(dd) AS BIGINT) AS d_num,
         |  CAST(min(CASE WHEN dd = d_max THEN vm END) AS BIGINT)
         |    AS argmax_micro,
         |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
         |    round(max(dd)::DOUBLE / (n_ref::DOUBLE * n_cur), 6) END AS ks
         |FROM mm GROUP BY g, n_ref, n_cur ORDER BY feature""".stripMargin
    },

    "q185_covariate_balance" ->
      """WITH f AS (SELECT user_id AS u, event_type AS ft,
        |    CAST(sum(CAST(round(value * 1e3) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |un AS (SELECT DISTINCT u FROM f),
        |ft AS (SELECT DISTINCT ft FROM f),
        |grid AS (SELECT un.u, ft.ft, CAST(coalesce(f.v, 0) AS BIGINT) AS v,
        |    un.u % 2 AS arm
        |  FROM un CROSS JOIN ft LEFT JOIN f ON f.u = un.u AND f.ft = ft.ft),
        |s AS (SELECT ft, arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s, sum(v * v) AS q FROM grid
        |  GROUP BY 1, 2),
        |p AS (SELECT ft,
        |    max(CASE WHEN arm = 0 THEN n END) AS n0,
        |    max(CASE WHEN arm = 0 THEN s END) AS s0,
        |    max(CASE WHEN arm = 0 THEN q END) AS q0,
        |    max(CASE WHEN arm = 1 THEN n END) AS n1,
        |    max(CASE WHEN arm = 1 THEN s END) AS s1,
        |    max(CASE WHEN arm = 1 THEN q END) AS q1
        |  FROM s GROUP BY 1),
        |e AS (SELECT *,
        |    CAST(n0 * q0 - s0::HUGEINT * s0 AS DOUBLE) /
        |      (n0::DOUBLE * (n0 - 1)) AS v0,
        |    CAST(n1 * q1 - s1::HUGEINT * s1 AS DOUBLE) /
        |      (n1::DOUBLE * (n1 - 1)) AS v1
        |  FROM p),
        |z AS (SELECT *, (v0 + v1) / 2.0 AS pooled,
        |    CASE WHEN n0 > 1 AND n1 > 1 AND (v0 + v1) / 2.0 > 0 THEN
        |      round((s1::DOUBLE / n1 - s0::DOUBLE / n0) /
        |        sqrt((v0 + v1) / 2.0), 6) END AS smd
        |  FROM e)
        |SELECT ft AS feature, n0 AS n_ctrl, n1 AS n_treat,
        |  round(s0::DOUBLE / n0, 6) AS mean_ctrl_milli,
        |  round(s1::DOUBLE / n1, 6) AS mean_treat_milli, smd,
        |  CASE WHEN smd IS NOT NULL THEN abs(smd) < 0.1 END AS balanced
        |FROM z ORDER BY feature""".stripMargin)
}
