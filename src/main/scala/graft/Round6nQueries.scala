package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AssociationRules, ProfileDrift}

/** Round-6 part fifteen: the two-sample test battery around the q98/q158
  * drift cut — Mann–Whitney rank-sum (stochastic dominance + effect
  * size) and Welch's t (mean shift, unequal variance) — plus
  * market-basket association rules with the Apriori downward-closure
  * prune.
  */
object Round6nQueries {

  /** Pair/item support floor for q167 — 3 binds hard at sf0.01 (3,253
    * of 3,313 co-occurring pairs fall below it, leaving 60).
    */
  val RuleMinSupport = 3L

  private def eventsSplit(s: SparkSession, dir: String) = {
    val ev = Tables.load(s, dir, "events")
    val cut = lit(Round5fQueries.PsiCutoff).cast("timestamp")
    (ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Rank-sum over the same mid-month cut as q98 PSI / q158 KS:
    // doubled-U integer core, tie-corrected z, rank-biserial effect.
    "q165_rank_sum" -> ((s, dir) => {
      val (ref, cur) = eventsSplit(s, dir)
      ProfileDrift.rankSumReport(ref, cur, "event_type", "value")
    }),

    // Welch's t on the same cut: milli-integer sufficient statistics,
    // per-side integer variance cores, Welch–Satterthwaite df.
    "q166_welch_t" -> ((s, dir) => {
      val (ref, cur) = eventsSplit(s, dir)
      ProfileDrift.welchTReport(ref, cur, "event_type", "value")
    }),

    // Association rules over order baskets (capped like the co-purchase
    // graph); minSupport prunes items before the pair join.
    "q167_assoc_rules" -> ((s, dir) =>
      AssociationRules.rules(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", RuleMinSupport,
        maxGroupSize = Some(Round6bQueries.CoPurchaseCap))))

  val oracleSql: Map[String, String] = Map(
    "q165_rank_sum" ->
      s"""WITH v AS (SELECT event_type AS g,
         |    CAST(round(value * 1e6) AS BIGINT) AS vm,
         |    CASE WHEN ts < TIMESTAMP '${Round5fQueries.PsiCutoff}'
         |      THEN 1 ELSE 0 END AS isref FROM events),
         |h AS (SELECT g, vm, sum(isref) AS c_ref, sum(1 - isref) AS c_cur
         |  FROM v GROUP BY 1, 2),
         |w AS (SELECT *,
         |    sum(c_cur) OVER (PARTITION BY g ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cur,
         |    CAST(sum(c_ref) OVER (PARTITION BY g) AS BIGINT) AS n_ref,
         |    CAST(sum(c_cur) OVER (PARTITION BY g) AS BIGINT) AS n_cur
         |  FROM h),
         |s AS (SELECT g, n_ref, n_cur,
         |    CAST(sum(c_ref * (2 * cum_cur - c_cur)) AS BIGINT) AS u2,
         |    CAST(sum((c_ref + c_cur) * (c_ref + c_cur) * (c_ref + c_cur)
         |      - (c_ref + c_cur)) AS BIGINT) AS tie3
         |  FROM w GROUP BY 1, 2, 3),
         |e AS (SELECT *,
         |    (n_ref::DOUBLE * n_cur / 12.0) * ((n_ref + n_cur + 1) -
         |      tie3::DOUBLE / ((n_ref + n_cur)::DOUBLE
         |        * (n_ref + n_cur - 1))) AS var_u
         |  FROM s)
         |SELECT g AS event_type, n_ref, n_cur, u2, tie3,
         |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
         |    round(u2::DOUBLE / (n_ref::DOUBLE * n_cur) - 1, 6) END AS r_rb,
         |  CASE WHEN n_ref > 0 AND n_cur > 0 AND var_u > 0 THEN
         |    round((u2 - n_ref * n_cur) / (2.0 * sqrt(var_u)), 6) END AS z
         |FROM e ORDER BY event_type""".stripMargin,

    "q166_welch_t" ->
      s"""WITH v AS (SELECT event_type AS g,
         |    CAST(round(value * 1e3) AS BIGINT) AS y,
         |    CASE WHEN ts < TIMESTAMP '${Round5fQueries.PsiCutoff}'
         |      THEN 1 ELSE 0 END AS isref FROM events),
         |s AS (SELECT g,
         |    CAST(sum(isref) AS BIGINT) AS n_ref,
         |    CAST(sum(1 - isref) AS BIGINT) AS n_cur,
         |    CAST(sum(y * isref) AS BIGINT) AS s_ref_milli,
         |    CAST(sum(y * (1 - isref)) AS BIGINT) AS s_cur_milli,
         |    sum(y * y * isref) AS q_ref,
         |    sum(y * y * (1 - isref)) AS q_cur FROM v GROUP BY g),
         |c AS (SELECT g, n_ref, n_cur, s_ref_milli, s_cur_milli,
         |    CASE WHEN n_ref > 1 THEN CAST(round(
         |      CAST(n_ref * q_ref - s_ref_milli::HUGEINT * s_ref_milli
         |        AS DOUBLE) /
         |      (n_ref::DOUBLE * (n_ref - 1))) AS BIGINT) END AS v_ref_milli2,
         |    CASE WHEN n_cur > 1 THEN CAST(round(
         |      CAST(n_cur * q_cur - s_cur_milli::HUGEINT * s_cur_milli
         |        AS DOUBLE) /
         |      (n_cur::DOUBLE * (n_cur - 1))) AS BIGINT) END AS v_cur_milli2
         |  FROM s),
         |e AS (SELECT *, v_ref_milli2::DOUBLE / n_ref AS se1,
         |    v_cur_milli2::DOUBLE / n_cur AS se2 FROM c)
         |SELECT g AS event_type, n_ref, n_cur, s_ref_milli, s_cur_milli,
         |  v_ref_milli2, v_cur_milli2,
         |  CASE WHEN n_ref > 1 AND n_cur > 1 AND se1 + se2 > 0 THEN
         |    round((s_ref_milli::DOUBLE / n_ref - s_cur_milli::DOUBLE / n_cur)
         |      / sqrt(se1 + se2), 6) END AS t_stat,
         |  CASE WHEN n_ref > 1 AND n_cur > 1 AND se1 + se2 > 0 THEN
         |    round(((se1 + se2) * (se1 + se2)) /
         |      ((se1 * se1) / (n_ref - 1) + (se2 * se2) / (n_cur - 1)), 3)
         |  END AS df_w
         |FROM e ORDER BY event_type""".stripMargin,

    "q167_assoc_rules" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
         |  FROM lineitem),
         |hot AS (SELECT g FROM li GROUP BY g
         |  HAVING count(*) > ${Round6bQueries.CoPurchaseCap}),
         |base AS (SELECT * FROM li WHERE g NOT IN (SELECT g FROM hot)),
         |nb AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_baskets
         |  FROM base),
         |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS n_it FROM base
         |  GROUP BY it),
         |fi AS (SELECT it FROM ic WHERE n_it >= $RuleMinSupport),
         |pr AS (SELECT * FROM base WHERE it IN (SELECT it FROM fi)),
         |p AS (SELECT a.it AS it_a, b.it AS it_b,
         |    CAST(count(*) AS BIGINT) AS n_both
         |  FROM pr a JOIN pr b ON a.g = b.g AND a.it < b.it
         |  GROUP BY 1, 2 HAVING count(*) >= $RuleMinSupport),
         |d AS (SELECT it_a AS antecedent, it_b AS consequent, n_both FROM p
         |  UNION ALL SELECT it_b, it_a, n_both FROM p)
         |SELECT d.antecedent, d.consequent, nb.n_baskets,
         |  a.n_it AS n_ante, c.n_it AS n_cons, d.n_both,
         |  CAST((d.n_both * 1000000) // nb.n_baskets AS BIGINT) AS supp_ppm,
         |  CAST((d.n_both * 1000000) // a.n_it AS BIGINT) AS conf_ppm,
         |  round(d.n_both::DOUBLE * nb.n_baskets /
         |    (a.n_it::DOUBLE * c.n_it), 6) AS lift
         |FROM d JOIN ic a ON a.it = d.antecedent
         |  JOIN ic c ON c.it = d.consequent, nb
         |ORDER BY antecedent, consequent""".stripMargin)
}
