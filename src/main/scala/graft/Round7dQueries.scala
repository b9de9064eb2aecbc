package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Concentration, Sampling}

/** Round-6 part thirty-one: Herfindahl concentration and Kish
  * effective sample size under importance weights.
  */
object Round7dQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HHI of the language mix per source — the dominant-category
    // counterpart of q176's entropy view.
    "q198_hhi" -> ((s, dir) =>
      Concentration.hhiReport(Tables.load(s, dir, "documents"),
        "source", "lang")),

    // ESS per source when docs are importance-weighted by length.
    "q199_ess" -> ((s, dir) =>
      Sampling.essReport(Tables.load(s, dir, "documents"),
        "source", "n_chars")))

  val oracleSql: Map[String, String] = Map(
    "q198_hhi" ->
      """WITH c AS (SELECT source AS g, lang AS cat, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |s AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(c::HUGEINT * c) AS BIGINT) AS sum_sq
        |  FROM c GROUP BY 1)
        |SELECT g AS source, n AS n_rows, k AS n_cats, sum_sq,
        |  round(sum_sq::DOUBLE / (n::DOUBLE * n), 6) AS hhi,
        |  round((n::DOUBLE * n) / sum_sq::DOUBLE, 6) AS eff_n
        |FROM s ORDER BY source""".stripMargin,

    "q199_ess" ->
      """WITH w AS (SELECT source AS g,
        |    CAST(round(n_chars * 1e3) AS BIGINT) AS wm FROM documents),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(wm) AS BIGINT) AS sw, sum(wm::HUGEINT * wm) AS sww
        |  FROM w GROUP BY 1),
        |e AS (SELECT g, n_rows, sw,
        |    CASE WHEN sww > 0 THEN
        |      round((sw::DOUBLE * sw) / sww::DOUBLE, 6) END AS ess
        |  FROM s)
        |SELECT g AS source, n_rows, sw AS sum_w_milli, ess,
        |  CASE WHEN ess IS NOT NULL THEN round(ess / n_rows, 6) END
        |    AS ess_ratio
        |FROM e ORDER BY source""".stripMargin)
}
