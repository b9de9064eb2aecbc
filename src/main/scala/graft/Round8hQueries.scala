package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, TimeSeries}

/** Round-8 part eight: rank/variance tests, FDR adjustment, and the
  * Page–Hinkley drift detector.
  */
object Round8hQueries {

  val FdrAlphaPpm = 50000L
  val PhDelta = 0L
  val PhLambda = 10L

  /** p-value proxy from the Welch t: the logistic approximation to the
    * two-sided normal tail, `p ≈ 2/(1+e^{1.702|t|})` — documented as
    * an approximation (the ADJUSTMENT mechanics are the operator);
    * identical formula on both engines, rounded to ppm.
    */
  private def welchP(s: SparkSession, dir: String): DataFrame =
    Correlate.pairwiseWelch(Tables.load(s, dir, "events"),
      "event_type", "value")
      .withColumn("p_ppm",
        round(lit(2e6) / (lit(1.0) +
          exp(lit(1.702) * abs(col("t_stat"))))).cast("long"))
      .select("group_a", "group_b", "p_ppm")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Rank-based one-way ANOVA across event types — robust where the
    // mean contrasts are dragged by heavy tails.
    "q240_kruskal_wallis" -> ((s, dir) =>
      Correlate.kruskalWallis(Tables.load(s, dir, "events"),
        "event_type", "value")),

    // Variance homogeneity with median centers — the assumption check
    // upstream of pooled-variance contrasts.
    "q241_brown_forsythe" -> ((s, dir) =>
      Correlate.brownForsythe(Tables.load(s, dir, "events"),
        "event_type", "value")),

    // Benjamini-Hochberg step-up over the pairwise-Welch sweep.
    "q242_fdr_welch" -> ((s, dir) =>
      Correlate.fdrBh(welchP(s, dir), Seq("group_a", "group_b"),
        "p_ppm", FdrAlphaPpm)),

    // Online drift vs the RUNNING mean — CUSUM's prospective sibling.
    "q243_page_hinkley" -> ((s, dir) =>
      TimeSeries.pageHinkleyReport(Tables.load(s, dir, "events"),
        "event_type", deltaCount = PhDelta, lambdaCount = PhLambda)))

  val oracleSql: Map[String, String] = Map(
    "q240_kruskal_wallis" ->
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
        |pt AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(n_h) AS BIGINT) AS n,
        |    CAST(sum((r2_h * r2_h) // n_h) AS HUGEINT) AS sq FROM pg),
        |tt AS (SELECT CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct)
        |    AS HUGEINT) AS t3 FROM rk),
        |o AS (SELECT n, n_groups,
        |    round(3.0 * sq::DOUBLE / (n::DOUBLE * (n + 1)::DOUBLE) -
        |      3.0 * (n + 1)::DOUBLE, 6) AS h_stat,
        |    round(1.0 - t3::DOUBLE / (n::DOUBLE * n::DOUBLE *
        |      n::DOUBLE - n::DOUBLE), 6) AS tie_correction
        |  FROM pt, tt)
        |SELECT n, n_groups, h_stat, tie_correction,
        |  CASE WHEN tie_correction > 0
        |    THEN round(h_stat / tie_correction, 6) END AS h_corrected
        |FROM o""".stripMargin,

    "q241_brown_forsythe" ->
      """WITH cl AS (SELECT event_type AS g,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |wc AS (SELECT g, vm, c, sum(c) OVER (PARTITION BY g
        |      ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS ng FROM cl),
        |md AS (SELECT g,
        |    min(CASE WHEN cum >= (ng + 1) // 2 THEN vm END) +
        |    min(CASE WHEN cum >= (ng + 2) // 2 THEN vm END) AS m2
        |  FROM wc GROUP BY g),
        |dv AS (SELECT cl.g, c, abs(2 * vm - m2) AS d
        |  FROM cl JOIN md ON md.g = cl.g),
        |pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_h,
        |    CAST(sum(CAST(c AS HUGEINT) * d) AS HUGEINT) AS s_h,
        |    CAST(sum(CAST(c AS HUGEINT) * d * d) AS HUGEINT) AS ss_h
        |  FROM dv GROUP BY 1),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n_h) AS BIGINT) AS n,
        |    CAST(sum(s_h) AS HUGEINT) AS s,
        |    CAST(sum(ss_h) AS HUGEINT) AS ss,
        |    CAST(sum((s_h * s_h) // n_h) AS HUGEINT) AS sqh FROM pg)
        |SELECT n, k AS n_groups,
        |  CASE WHEN k > 1 AND (ss - sqh)::DOUBLE > 0 THEN
        |    round((n - k)::DOUBLE / (k - 1)::DOUBLE *
        |      (sqh::DOUBLE - (s * s)::DOUBLE / n::DOUBLE) /
        |      (ss - sqh)::DOUBLE, 6) END AS f_stat
        |FROM ag""".stripMargin,

    "q242_fdr_welch" -> {
      val w = Round7cQueries.oracleSql("q197_pairwise_welch")
      s"""WITH w AS ($w),
         |p AS (SELECT group_a, group_b,
         |    CAST(round(2e6 / (1.0 + exp(1.702 * abs(t_stat))))
         |      AS BIGINT) AS p_ppm
         |  FROM w WHERE t_stat IS NOT NULL),
         |r AS (SELECT group_a, group_b, p_ppm,
         |    CAST(row_number() OVER (ORDER BY p_ppm, group_a, group_b)
         |      AS INTEGER) AS rank,
         |    count(*) OVER () AS n_tests
         |  FROM p),
         |c AS (SELECT *, least((CAST(p_ppm AS HUGEINT) * n_tests) //
         |    rank, 1000000) AS cand FROM r)
         |SELECT group_a, group_b, p_ppm, rank,
         |  CAST(min(cand) OVER (ORDER BY rank DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS adj_p_ppm,
         |  min(cand) OVER (ORDER BY rank DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    <= $FdrAlphaPpm AS significant
         |FROM c ORDER BY rank""".stripMargin
    },

    "q243_page_hinkley" ->
      s"""WITH d AS (SELECT event_type AS key,
         |    date_trunc('day', ts)::DATE AS day,
         |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
         |t AS (SELECT key, day, x,
         |    row_number() OVER (PARTITION BY key ORDER BY day) AS i,
         |    sum(x) OVER (PARTITION BY key ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum FROM d),
         |u AS (SELECT key, day, x,
         |    sum(x - cum // i - $PhDelta) OVER (PARTITION BY key
         |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
         |      CURRENT ROW) AS u FROM t),
         |m AS (SELECT key, day, x, u,
         |    min(u) OVER (PARTITION BY key ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS minu FROM u)
         |SELECT key AS event_type, day, x,
         |  CAST(u - minu AS BIGINT) AS ph_stat,
         |  (u - minu) > $PhLambda AS alarm
         |FROM m ORDER BY event_type, day""".stripMargin)
}
