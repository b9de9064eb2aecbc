package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Correlate

/** Round-8 part fourteen: the Jonckheere–Terpstra ordered-alternative
  * trend test.
  */
object Round8nQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Does event value shift monotonically across the day's four
    // six-hour bins — the directional read q240's omnibus can't give.
    "q257_jonckheere" -> ((s, dir) =>
      Correlate.jonckheereTerpstra(
        Tables.load(s, dir, "events")
          .withColumn("t", expr("hour(ts) div 6")),
        "t", "value")))

  val oracleSql: Map[String, String] = Map(
    "q257_jonckheere" -> {
      val varSql =
        """(n::DOUBLE * (n::DOUBLE - 1.0) * (2.0 * n::DOUBLE + 5.0)
          |      - a_g::DOUBLE - a_t::DOUBLE) / 72.0 +
          |    b1::DOUBLE * b2::DOUBLE / (36.0 * n::DOUBLE *
          |      (n::DOUBLE - 1.0) * (n::DOUBLE - 2.0)) +
          |    c1::DOUBLE * c2::DOUBLE / (8.0 * n::DOUBLE *
          |      (n::DOUBLE - 1.0))""".stripMargin
      s"""WITH cl AS (SELECT CAST(hour(ts) // 6 AS BIGINT) AS g,
         |    CAST(round(value * 1e6) AS BIGINT) AS vm,
         |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
         |vs AS (SELECT DISTINCT vm FROM cl),
         |gs AS (SELECT DISTINCT g FROM cl),
         |dense AS (SELECT gs.g, vs.vm, coalesce(cl.c, 0) AS c
         |  FROM gs CROSS JOIN vs
         |  LEFT JOIN cl ON cl.g = gs.g AND cl.vm = vs.vm),
         |dc AS (SELECT g, vm, c,
         |    sum(c) OVER (PARTITION BY g ORDER BY vm ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cumlt
         |  FROM dense),
         |jt AS (SELECT CAST(sum(CAST(b.c AS HUGEINT) *
         |      (2 * a.cumlt + a.c)) AS HUGEINT) AS jt2
         |  FROM dc a JOIN dc b ON a.vm = b.vm AND a.g < b.g),
         |ng AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
         |    CAST(sum(n_k) AS BIGINT) AS n,
         |    CAST(sum(CAST(n_k AS HUGEINT) * n_k) AS HUGEINT)
         |      AS sq_n,
         |    CAST(sum(CAST(n_k AS HUGEINT) * (n_k - 1) *
         |      (2 * n_k + 5)) AS HUGEINT) AS a_g,
         |    CAST(sum(CAST(n_k AS HUGEINT) * (n_k - 1) * (n_k - 2))
         |      AS HUGEINT) AS b1,
         |    CAST(sum(CAST(n_k AS HUGEINT) * (n_k - 1)) AS HUGEINT)
         |      AS c1
         |  FROM (SELECT g, CAST(sum(c) AS BIGINT) AS n_k FROM cl
         |    GROUP BY 1)),
         |tt AS (SELECT
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
         |      AS HUGEINT) AS a_t,
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (t - 2))
         |      AS HUGEINT) AS b2,
         |    CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT)
         |      AS c2
         |  FROM (SELECT vm, CAST(sum(c) AS BIGINT) AS t FROM cl
         |    GROUP BY 1))
         |SELECT n, n_groups, CAST(jt2 AS BIGINT) AS jt2,
         |  CAST((CAST(n AS HUGEINT) * n - sq_n) // 2 AS BIGINT)
         |    AS e2,
         |  CASE WHEN n > 2 AND $varSql > 0 THEN
         |    round((jt2::DOUBLE -
         |        ((CAST(n AS HUGEINT) * n - sq_n) // 2)::DOUBLE) /
         |      (2.0 * sqrt($varSql)), 6)
         |  END AS z_jt
         |FROM jt, ng, tt""".stripMargin
    })
}
