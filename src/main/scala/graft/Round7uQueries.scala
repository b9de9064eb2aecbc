package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Deciles, TextOps, TimeSeries}

/** Round-7 part sixteen: lead/lag cross-correlation and the weighted
  * median.
  */
object Round7uQueries {

  val XcorrMaxLag = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Do errors follow purchases, and by how many days?
    "q220_cross_correlation" -> ((s, dir) =>
      TimeSeries.crossCorrelation(Tables.load(s, dir, "events"),
        "event_type", "purchase", "error", XcorrMaxLag)),

    // Median doc length by TOKEN MASS per source (vs the unweighted
    // median a doc-count view reports).
    "q221_weighted_median" -> ((s, dir) =>
      Deciles.weightedMedian(
        Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "n_chars", "n_tokens")))

  val oracleSql: Map[String, String] = Map(
    "q220_cross_correlation" ->
      s"""WITH d AS (SELECT event_type AS key,
         |    date_trunc('day', ts)::DATE AS day,
         |    CAST(count(*) AS BIGINT) AS y
         |  FROM events WHERE event_type IN ('purchase', 'error')
         |  GROUP BY 1, 2),
         |a AS (SELECT day, y AS ya FROM d WHERE key = 'purchase'),
         |b AS (SELECT day AS day_b, y AS yb FROM d WHERE key = 'error'),
         |f AS (SELECT a.day, a.ya, CAST(l.lag AS INTEGER) AS lag
         |  FROM a, unnest(range(-$XcorrMaxLag, ${XcorrMaxLag + 1}))
         |    l(lag)),
         |s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(sum(CAST(ya AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(yb AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(ya AS HUGEINT) * ya) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(yb AS HUGEINT) * yb) AS HUGEINT) AS syy,
         |    CAST(sum(CAST(ya AS HUGEINT) * yb) AS HUGEINT) AS sxy
         |  FROM f JOIN b ON b.day_b = f.day + f.lag
         |  GROUP BY 1),
         |r AS (SELECT lag, n_days,
         |    CASE WHEN n_days >= 3
         |      AND (n_days::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |        > 0
         |      AND (n_days::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
         |        > 0 THEN
         |      round((n_days::DOUBLE * sxy::DOUBLE -
         |        sx::DOUBLE * sy::DOUBLE) /
         |        sqrt((n_days::DOUBLE * sxx::DOUBLE -
         |          sx::DOUBLE * sx::DOUBLE) *
         |         (n_days::DOUBLE * syy::DOUBLE -
         |          sy::DOUBLE * sy::DOUBLE)), 6) END AS r
         |  FROM s),
         |m AS (SELECT max(CASE WHEN r IS NOT NULL THEN
         |      CAST(round(abs(r) * 1e6) AS BIGINT) END) AS am FROM r),
         |bl AS (SELECT min(lag) AS best_lag FROM r, m
         |  WHERE r IS NOT NULL
         |    AND CAST(round(abs(r) * 1e6) AS BIGINT) = m.am)
         |SELECT r.lag, r.n_days, r.r,
         |  (bl.best_lag IS NOT NULL AND r.lag = bl.best_lag) AS best
         |FROM r, bl ORDER BY r.lag""".stripMargin,

    "q221_weighted_median" ->
      s"""WITH d AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
         |    CAST(len(${LlmQueries.tokSql}) AS BIGINT) AS w
         |  FROM documents),
         |cen AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c,
         |    CAST(sum(w) AS BIGINT) AS wsum FROM d GROUP BY 1, 2),
         |k AS (SELECT *,
         |    CAST(sum(wsum) OVER (PARTITION BY g ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cw,
         |    CAST(sum(wsum) OVER (PARTITION BY g) AS BIGINT) AS tw,
         |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
         |  FROM cen)
         |SELECT g AS source, n AS n_rows, tw AS total_weight,
         |  CAST(min(CASE WHEN cw >= (tw + 1) // 2 THEN v END) AS BIGINT)
         |    AS wmedian
         |FROM k GROUP BY 1, 2, 3 ORDER BY source""".stripMargin)
}
