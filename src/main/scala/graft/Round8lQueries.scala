package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, ProfileDrift}

/** Round-8 part twelve: Wasserstein-1 drift (the earth-mover number
  * with units) and Dunn's post-hoc pairwise test after
  * Kruskal–Wallis.
  */
object Round8lQueries {

  private def eventsSplit(s: SparkSession, dir: String) = {
    val ev = Tables.load(s, dir, "events")
    val cut = lit(Round5fQueries.PsiCutoff).cast("timestamp")
    (ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // How far apart (in value units) the two halves' distributions
    // are — the same mid-month cut as q98 PSI / q158 KS / q165 U.
    "q253_wasserstein" -> ((s, dir) => {
      val (ref, cur) = eventsSplit(s, dir)
      ProfileDrift.wassersteinReport(ref, cur, "event_type", "value")
    }),

    // WHICH event-type pairs differ in rank location after q240's
    // omnibus — Dunn's z on the pooled ranking.
    "q254_dunn_pairs" -> ((s, dir) =>
      Correlate.dunnPairs(Tables.load(s, dir, "events"),
        "event_type", "value")))

  val oracleSql: Map[String, String] = Map(
    "q253_wasserstein" ->
      s"""WITH v AS (SELECT event_type AS g,
         |    CAST(round(value * 1e6) AS BIGINT) AS vm,
         |    CASE WHEN ts < TIMESTAMP '${Round5fQueries.PsiCutoff}'
         |      THEN 1 ELSE 0 END AS isref FROM events),
         |h AS (SELECT g, vm, CAST(sum(isref) AS BIGINT) AS c_ref,
         |    CAST(sum(1 - isref) AS BIGINT) AS c_cur
         |  FROM v GROUP BY 1, 2),
         |w AS (SELECT *,
         |    sum(c_ref) OVER wc AS cum_ref,
         |    sum(c_cur) OVER wc AS cum_cur,
         |    CAST(sum(c_ref) OVER (PARTITION BY g) AS BIGINT)
         |      AS n_ref,
         |    CAST(sum(c_cur) OVER (PARTITION BY g) AS BIGINT)
         |      AS n_cur,
         |    lead(vm) OVER (PARTITION BY g ORDER BY vm) AS nxt
         |  FROM h WINDOW wc AS (PARTITION BY g ORDER BY vm
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |s AS (SELECT g, n_ref, n_cur,
         |    CAST(sum(CASE WHEN nxt IS NULL THEN 0 ELSE
         |      abs(CAST(cum_ref AS HUGEINT) * n_cur -
         |        CAST(cum_cur AS HUGEINT) * n_ref) * (nxt - vm)
         |      END) AS HUGEINT) AS num
         |  FROM w GROUP BY 1, 2, 3)
         |SELECT g AS event_type, n_ref, n_cur,
         |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
         |    CAST(num // (CAST(n_ref AS HUGEINT) * n_cur) AS BIGINT)
         |  END AS w1_micro
         |FROM s ORDER BY event_type""".stripMargin,

    "q254_dunn_pairs" ->
      """WITH cl AS (SELECT event_type AS g,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |bv AS (SELECT vm, CAST(sum(c) AS BIGINT) AS ct FROM cl
        |  GROUP BY 1),
        |rk AS (SELECT vm, 2 * (cum - ct) + ct + 1 AS r2, ct
        |  FROM (SELECT vm, ct, sum(ct) OVER (ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM bv)),
        |pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_h,
        |    CAST(sum(CAST(c AS HUGEINT) * r2) AS HUGEINT) AS r2_h
        |  FROM cl JOIN rk USING (vm) GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_h) AS BIGINT) AS n FROM pg),
        |tt AS (SELECT CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct)
        |    AS HUGEINT) AS t3 FROM rk)
        |SELECT a.g AS group_a, b.g AS group_b,
        |  a.n_h AS n_a, b.n_h AS n_b,
        |  CASE WHEN n > 1 AND
        |    (n::DOUBLE * (n::DOUBLE + 1.0) / 12.0 -
        |      t3::DOUBLE / (12.0 * (n::DOUBLE - 1.0))) *
        |      (1.0 / a.n_h::DOUBLE + 1.0 / b.n_h::DOUBLE) > 0 THEN
        |    round((a.r2_h::DOUBLE / (2.0 * a.n_h::DOUBLE) -
        |        b.r2_h::DOUBLE / (2.0 * b.n_h::DOUBLE)) /
        |      sqrt((n::DOUBLE * (n::DOUBLE + 1.0) / 12.0 -
        |        t3::DOUBLE / (12.0 * (n::DOUBLE - 1.0))) *
        |        (1.0 / a.n_h::DOUBLE + 1.0 / b.n_h::DOUBLE)), 6)
        |  END AS z_dunn
        |FROM pg a JOIN pg b ON a.g < b.g, tot, tt
        |ORDER BY group_a, group_b""".stripMargin)
}
