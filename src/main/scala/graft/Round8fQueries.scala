package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Experiment, Sampling, Transitions}

/** Round-8 part six: sequential triples, IPW estimation, Neyman
  * allocation, average precision.
  */
object Round8fQueries {

  val TriplesTopN = 30
  val NeymanBudget = 1000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Length-3 gapped sequential patterns by key support — the
    // PrefixSpan question at fixed depth via witness statistics.
    "q234_seq_triples" -> ((s, dir) =>
      Transitions.sequentialTriples(Tables.load(s, dir, "events"),
        TriplesTopN)),

    // IPW ATE with empirical bin propensities (treatment = user
    // parity, covariate = event type); naive contrast alongside.
    "q235_ipw_ate" -> ((s, dir) =>
      Experiment.ipwAte(Tables.load(s, dir, "events"),
        pmod(col("user_id"), lit(2L)) === 1, col("value"),
        col("event_type"))),

    // Neyman sample-budget allocation across event-type strata by
    // exact N_h·σ_h weights, largest-remainder to hit the budget.
    "q236_neyman_allocation" -> ((s, dir) =>
      Sampling.neymanAllocation(Tables.load(s, dir, "events"),
        "event_type", "value", NeymanBudget)),

    // Average precision of the char-length score for "is a purchase"
    // — the imbalance-honest single-number PR summary.
    "q237_average_precision" -> ((s, dir) =>
      Evaluation.averagePrecision(
        Tables.load(s, dir, "events")
          .select(round(col("value") * 100).cast("long").as("score"),
            col("event_type")),
        "score", col("event_type") === "purchase")))

  val oracleSql: Map[String, String] = Map(
    "q234_seq_triples" ->
      s"""WITH pos AS (SELECT user_id AS key, event_type AS state,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS pos
         |  FROM events),
         |st AS (SELECT key, state, min(pos) AS fp, max(pos) AS lp
         |  FROM pos GROUP BY 1, 2),
         |fab AS (SELECT a.key, a.state AS a, p.state AS b,
         |    CAST(min(p.pos) AS BIGINT) AS fab
         |  FROM st a JOIN pos p ON p.key = a.key AND p.pos > a.fp
         |    AND p.state <> a.state
         |  GROUP BY 1, 2, 3)
         |SELECT fab.a AS type_a, fab.b AS type_b, c.state AS type_c,
         |  CAST(count(*) AS BIGINT) AS support
         |FROM fab JOIN st c ON c.key = fab.key
         |  AND c.state <> fab.a AND c.state <> fab.b
         |  AND fab.fab < c.lp
         |GROUP BY 1, 2, 3
         |ORDER BY support DESC, type_a, type_b, type_c
         |LIMIT $TriplesTopN""".stripMargin,

    "q235_ipw_ate" ->
      """WITH b AS (SELECT event_type AS g,
        |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t,
        |    CAST(round(value * 1e6) AS BIGINT) AS ym FROM events),
        |bins AS (SELECT g, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(sum(t) AS BIGINT) AS nt_b FROM b GROUP BY 1),
        |us AS (SELECT g, (nt_b * 1000000) // n_b AS e FROM bins
        |  WHERE (nt_b * 1000000) // n_b > 0
        |    AND (nt_b * 1000000) // n_b < 1000000),
        |cl AS (SELECT t, ym, CASE WHEN t = 1
        |      THEN (CAST(ym AS HUGEINT) * 1000000) // e
        |      ELSE -((CAST(ym AS HUGEINT) * 1000000) // (1000000 - e))
        |      END AS cell
        |  FROM b JOIN us ON us.g = b.g),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
        |SELECT tot.n, CAST(count(*) AS BIGINT) AS n_used,
        |  CAST(sum(t) AS BIGINT) AS n_treated_used,
        |  CAST(sum(cell) // count(*) AS BIGINT) AS ate_ipw_micro,
        |  CAST(sum(CASE WHEN t = 1 THEN ym ELSE 0 END) // sum(t) -
        |    sum(CASE WHEN t = 0 THEN ym ELSE 0 END) //
        |      (count(*) - sum(t)) AS BIGINT) AS ate_naive_micro
        |FROM cl, tot GROUP BY tot.n""".stripMargin,

    "q236_neyman_allocation" ->
      s"""WITH s AS (SELECT event_type AS g,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(round(sqrt(CAST(count(*) *
         |        sum(CAST(CAST(round(value * 1e6) AS BIGINT)
         |          AS HUGEINT) * CAST(round(value * 1e6) AS BIGINT)) -
         |        CAST(sum(CAST(round(value * 1e6) AS BIGINT))
         |          AS HUGEINT) * sum(CAST(round(value * 1e6)
         |          AS BIGINT)) AS DOUBLE)) / count(*)) AS BIGINT)
         |      AS sigma_micro
         |  FROM events GROUP BY 1),
         |w AS (SELECT *, CAST(n_rows AS HUGEINT) * sigma_micro AS w
         |  FROM s),
         |tw AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM w),
         |sh AS (SELECT g, n_rows, sigma_micro,
         |    CASE WHEN tw > 0 THEN CAST((w * $NeymanBudget) // tw
         |      AS BIGINT) ELSE 0 END AS fl,
         |    CASE WHEN tw > 0 THEN (w * $NeymanBudget) % tw
         |      ELSE 0 END AS rem, tw
         |  FROM w, tw),
         |short AS (SELECT $NeymanBudget - sum(fl) AS short FROM sh)
         |SELECT g AS event_type, n_rows, sigma_micro,
         |  CAST(fl + CASE WHEN rk <= short AND tw > 0 THEN 1 ELSE 0
         |    END AS BIGINT) AS alloc
         |FROM (SELECT *, row_number() OVER (ORDER BY rem DESC, g ASC)
         |    AS rk FROM sh), short
         |ORDER BY event_type""".stripMargin,

    "q237_average_precision" ->
      """WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |h AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(1 - y) AS BIGINT) AS neg FROM v GROUP BY 1),
        |c AS (SELECT s, pos, neg,
        |    sum(pos) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |    sum(neg) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
        |  FROM h)
        |SELECT CAST(sum(pos + neg) AS BIGINT) AS n,
        |  CAST(sum(pos) AS BIGINT) AS n_pos,
        |  CAST(count(*) AS BIGINT) AS n_thresholds,
        |  CAST(sum(CAST((CAST(pos AS HUGEINT) * tp * 1000000) //
        |    (tp + fp) AS BIGINT)) // sum(pos) AS BIGINT) AS ap_ppm
        |FROM c""".stripMargin)
}
