package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TimeSeries}

/** Round-6 part eight: lag-1 autocorrelation and the Mann–Kendall trend
  * test (the serial-dependence / nonparametric companions of q135/q146),
  * deterministic ±1 random projection (JL sketch), and a trailing-window
  * exact P95.
  */
object Round6gQueries {

  val RpK = 8
  val RpDim = 64

  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Serial dependence of daily volume per event type: cleared-denominator
    // cross/centered terms rounded to integer milli² before totalling.
    "q148_autocorr" -> ((s, dir) =>
      TimeSeries.autocorrReport(events(s, dir), "event_type")),

    // Nonparametric trend: integer S over the calendar pair join + the
    // tie-corrected 18·Var(S); continuity-corrected z at 6 dp.
    "q149_mann_kendall" -> ((s, dir) =>
      TimeSeries.mannKendall(events(s, dir), "event_type")),

    // 64→8 JL sketch with a frozen hash-sign matrix; exact integer
    // micro components, pure scan-stage folds.
    "q150_random_projection" -> ((s, dir) =>
      Similarity.randomProjection(Tables.load(s, dir, "embeddings"),
        RpK, RpDim)),

    // Daily trailing-7-day exact P95 of event value: value-domain fan +
    // conditional-min pick at ⌈0.95·n⌉.
    "q151_rolling_p95" -> ((s, dir) =>
      TimeSeries.rollingP95(events(s, dir))))

  val oracleSql: Map[String, String] = Map(
    "q148_autocorr" ->
      """WITH d0 AS (SELECT event_type AS key,
        |    date_trunc('day', ts)::DATE AS day,
        |    CAST(sum(CAST(round(value * 1e3) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT key, count(*) AS n_days, sum(y) AS s_all
        |  FROM d0 GROUP BY key),
        |w AS (SELECT d0.key, d0.day, d0.y, st.n_days, st.s_all
        |  FROM d0 JOIN st USING (key)),
        |den AS (SELECT key, CAST(max(n_days) AS BIGINT) AS n_days,
        |    CAST(sum(CAST(round(
        |      CAST((y * n_days - s_all) * (y * n_days - s_all) AS DOUBLE) /
        |      (n_days::DOUBLE * n_days)) AS BIGINT)) AS BIGINT)
        |      AS den_milli2
        |  FROM w GROUP BY key),
        |num AS (SELECT a.key, count(*) AS n_pairs,
        |    CAST(sum(CAST(round(
        |      CAST((a.y * a.n_days - a.s_all) * (b.y * a.n_days - a.s_all)
        |        AS DOUBLE) / (a.n_days::DOUBLE * a.n_days)) AS BIGINT))
        |      AS BIGINT) AS num_milli2
        |  FROM w a JOIN w b ON a.key = b.key AND b.day = a.day + 1
        |  GROUP BY a.key)
        |SELECT den.key AS event_type, den.n_days,
        |  CAST(coalesce(num.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  num.num_milli2, den.den_milli2,
        |  CASE WHEN den.den_milli2 > 0 AND coalesce(num.n_pairs, 0) > 0
        |    THEN round(num.num_milli2::DOUBLE / den.den_milli2, 6) END
        |    AS acf1
        |FROM den LEFT JOIN num ON num.key = den.key
        |ORDER BY event_type""".stripMargin,

    "q149_mann_kendall" ->
      """WITH d0 AS (SELECT event_type AS key,
        |    date_trunc('day', ts)::DATE AS day,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.key, CAST(sign(b2.y - a.y) AS BIGINT) AS sgn
        |  FROM d0 a JOIN d0 b2 ON a.key = b2.key AND a.day < b2.day),
        |s AS (SELECT key, count(*) AS n_pairs, sum(sgn) AS s_stat
        |  FROM p GROUP BY key),
        |t0 AS (SELECT key, y, count(*) AS t FROM d0 GROUP BY 1, 2),
        |t AS (SELECT key, count(*) AS n_distinct, sum(t) AS n_days,
        |    sum(t * (t - 1) * (2 * t + 5)) AS tie_term FROM t0 GROUP BY key),
        |f AS (SELECT t.key, CAST(t.n_days AS BIGINT) AS n_days,
        |    CAST(t.n_distinct AS BIGINT) AS n_distinct,
        |    CAST(coalesce(s.n_pairs, 0) AS BIGINT) AS n_pairs,
        |    CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat,
        |    CAST(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) -
        |      t.tie_term AS BIGINT) AS var18
        |  FROM t LEFT JOIN s ON s.key = t.key)
        |SELECT key AS event_type, n_days, n_distinct, n_pairs, s_stat,
        |  var18,
        |  CASE WHEN var18 > 0 THEN round(
        |    (CASE WHEN s_stat > 0 THEN s_stat - 1
        |      WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END)::DOUBLE /
        |    sqrt(var18::DOUBLE / 18.0), 6) END AS z_stat
        |FROM f ORDER BY event_type""".stripMargin,

    // 0-based (i,j) into the Knuth hash; +1 below threshold, −1 above —
    // identical to the Scala literal matrix.
    "q150_random_projection" ->
      s"""WITH v AS (SELECT vec_id, CAST(t.i AS INTEGER) AS i,
         |    CAST(round(embedding[t.i] * 1e6) AS BIGINT) AS x
         |  FROM embeddings, range(1, ${RpDim + 1}) t(i)),
         |s AS (SELECT v.vec_id, u.j AS j, v.x,
         |    CASE WHEN (((CAST(v.i - 1 AS BIGINT) * $RpK + (u.j - 1))
         |        % 1000000007) * 2654435761) % 1000000007
         |        < ${Similarity.RpSignThreshold} THEN 1 ELSE -1 END AS sgn
         |  FROM v, range(1, ${RpK + 1}) u(j))
         |SELECT vec_id, CAST(j AS INTEGER) AS j,
         |  CAST(sum(x * sgn) AS BIGINT) AS comp_micro
         |FROM s GROUP BY 1, 2 ORDER BY vec_id, j""".stripMargin,

    "q151_rolling_p95" ->
      """WITH h AS (SELECT date_trunc('day', ts)::DATE AS day,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM h),
        |fan AS (SELECT d.day AS day, h.vm, CAST(sum(h.c) AS BIGINT) AS c
        |  FROM days d JOIN h ON h.day <= d.day AND h.day > d.day - 7
        |  GROUP BY 1, 2),
        |w AS (SELECT *, sum(c) OVER (PARTITION BY day ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY day) AS BIGINT) AS n_window
        |  FROM fan)
        |SELECT day, n_window,
        |  CAST((19 * n_window + 19) // 20 AS BIGINT) AS rank_q,
        |  CAST(min(CASE WHEN cum >= (19 * n_window + 19) // 20 THEN vm END)
        |    AS BIGINT) AS p95_micro
        |FROM w GROUP BY day, n_window ORDER BY day""".stripMargin)
}
