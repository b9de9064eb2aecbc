package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, TimeSeries}

/** Round-6 part seven: one-way ANOVA F (numeric×categorical dependence,
  * completing the q107/q134/q136 family), Theil–Sen robust slope (the
  * outlier-immune sibling of q135's OLS), and day-of-week seasonal
  * indices.
  */
object Round6fQueries {

  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Does mean event value differ by type? Milli-integer sufficient
    // statistics, per-group contributions rounded to integer milli²
    // before totalling (order-free), F at 6 dp.
    "q145_anova" -> ((s, dir) =>
      Correlate.anovaF(events(s, dir), "event_type", "value")),

    // Median of pairwise daily slopes per event type — calendar-grain
    // pair join over the cached daily census, doubled-integer median.
    "q146_theil_sen" -> ((s, dir) =>
      TimeSeries.theilSen(events(s, dir), "event_type")),

    // Weekday indices: each dow's share of the key's mean daily volume
    // in exact integer ppm.
    "q147_seasonality" -> ((s, dir) =>
      TimeSeries.seasonalityReport(events(s, dir), "event_type")))

  val oracleSql: Map[String, String] = Map(
    // HUGEINT-exact cores mirrored from the decimal(38,0) Spark side;
    // every double derives from the same exact integer in the same
    // operation order.
    "q145_anova" ->
      """WITH v AS (SELECT event_type AS g,
        |    CAST(round(value * 1e3) AS BIGINT) AS y FROM events),
        |s AS (SELECT g, count(*) AS n_g, sum(y) AS s_g,
        |    sum(y * y) AS ssq_g FROM v GROUP BY g),
        |w AS (SELECT *, CAST(sum(n_g) OVER () AS BIGINT) AS n_all,
        |    CAST(sum(s_g) OVER () AS BIGINT) AS s_all,
        |    count(*) OVER () AS k FROM s),
        |c AS (SELECT *,
        |    CAST(round(CAST(n_g * ssq_g - s_g * s_g AS DOUBLE) / n_g)
        |      AS BIGINT) AS ssw_milli2,
        |    CAST(round(CAST((s_g * n_all - s_all * n_g) *
        |        (s_g * n_all - s_all * n_g) AS DOUBLE) /
        |      (n_g::DOUBLE * n_all * n_all)) AS BIGINT) AS ssb_milli2
        |  FROM w),
        |t AS (SELECT *, CAST(sum(ssw_milli2) OVER () AS BIGINT)
        |      AS ssw_total,
        |    CAST(sum(ssb_milli2) OVER () AS BIGINT) AS ssb_total,
        |    CAST(k - 1 AS BIGINT) AS df1,
        |    CAST(n_all - k AS BIGINT) AS df2 FROM c)
        |SELECT g AS event_type, CAST(n_g AS BIGINT) AS n_g,
        |  CAST(s_g AS BIGINT) AS s_milli, ssw_milli2, ssb_milli2,
        |  ssw_total, ssb_total, df1, df2,
        |  CASE WHEN df1 > 0 AND df2 > 0 AND ssw_total > 0 THEN
        |    round((ssb_total::DOUBLE / df1) / (ssw_total::DOUBLE / df2), 6)
        |  END AS f_stat
        |FROM t ORDER BY event_type""".stripMargin,

    "q146_theil_sen" ->
      """WITH d0 AS (SELECT event_type AS key,
        |    date_trunc('day', ts)::DATE AS day,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS day0 FROM d0),
        |d AS (SELECT key, CAST(day - day0 AS BIGINT) AS x, y FROM d0, b),
        |sl AS (SELECT a.key,
        |    CAST(round((b2.y - a.y)::DOUBLE / (b2.x - a.x)) AS BIGINT)
        |      AS slope
        |  FROM d a JOIN d b2 ON a.key = b2.key AND b2.x > a.x),
        |ag AS (SELECT key, count(*) AS n_pairs,
        |    array_agg(slope ORDER BY slope) AS arr FROM sl GROUP BY key),
        |m AS (SELECT key, CAST(n_pairs AS BIGINT) AS n_pairs,
        |    CAST(arr[CAST((n_pairs + 1) // 2 AS INT)] +
        |      arr[CAST(n_pairs // 2 + 1 AS INT)] AS BIGINT) AS med2
        |  FROM ag)
        |SELECT key AS event_type, n_pairs, med2,
        |  round(med2::DOUBLE / 2, 1) AS slope_micro_per_day
        |FROM m ORDER BY event_type""".stripMargin,

    "q147_seasonality" ->
      """WITH daily AS (SELECT event_type AS key,
        |    date_trunc('day', ts)::DATE AS day,
        |    CAST(sum(CAST(round(value * 1e3) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |bd AS (SELECT key, CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
        |    count(*) AS n_days_dow, CAST(sum(y) AS BIGINT) AS s_dow
        |  FROM daily GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(sum(n_days_dow) OVER (PARTITION BY key) AS BIGINT)
        |      AS n_days,
        |    CAST(sum(s_dow) OVER (PARTITION BY key) AS BIGINT) AS s_total
        |  FROM bd)
        |SELECT key AS event_type, dow,
        |  CAST(n_days_dow AS BIGINT) AS n_days_dow, s_dow AS s_dow_milli,
        |  n_days, s_total AS s_total_milli,
        |  CAST((s_dow * n_days * 1000000) // (n_days_dow * s_total)
        |    AS BIGINT) AS idx_ppm
        |FROM w ORDER BY event_type, dow""".stripMargin)
}
