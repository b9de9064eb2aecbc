package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TimeSeries

/** Round-7 part seventeen: searched mean-shift changepoints. */
object Round7vQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q222_best_break" -> ((s, dir) =>
      TimeSeries.bestMeanBreak(Tables.load(s, dir, "events"),
        "event_type")))

  val oracleSql: Map[String, String] = Map(
    "q222_best_break" ->
      """WITH d AS (SELECT event_type AS key,
        |    date_trunc('day', ts)::DATE AS day,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY key ORDER BY day)
        |      AS BIGINT) AS i,
        |    CAST(sum(CAST(y AS HUGEINT)) OVER (PARTITION BY key
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS HUGEINT) AS cy,
        |    CAST(sum(CAST(y AS HUGEINT) * y) OVER (PARTITION BY key
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS HUGEINT) AS cyy,
        |    CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n,
        |    CAST(sum(CAST(y AS HUGEINT)) OVER (PARTITION BY key)
        |      AS HUGEINT) AS ty,
        |    CAST(sum(CAST(y AS HUGEINT) * y) OVER (PARTITION BY key)
        |      AS HUGEINT) AS tyy
        |  FROM d),
        |f AS (SELECT key, day, i, n,
        |    (cyy::DOUBLE - cy::DOUBLE * cy::DOUBLE / i) +
        |    ((tyy::DOUBLE - cyy::DOUBLE) -
        |      (ty::DOUBLE - cy::DOUBLE) * (ty::DOUBLE - cy::DOUBLE) /
        |      (n - i)) AS rss_split,
        |    tyy::DOUBLE - ty::DOUBLE * ty::DOUBLE / n AS rss_total
        |  FROM c WHERE n >= 4 AND i >= 2 AND i <= n - 2),
        |r AS (SELECT *, CAST(round(rss_split / 1e6) AS BIGINT) AS rm,
        |    row_number() OVER (PARTITION BY key
        |      ORDER BY CAST(round(rss_split / 1e6) AS BIGINT), day)
        |      AS pick
        |  FROM f)
        |SELECT key AS event_type, n AS n_days, day AS split_after_day,
        |  i AS n_left, round(rss_total / 1e12, 6) AS rss_total,
        |  round(rss_split / 1e12, 6) AS rss_split,
        |  CASE WHEN rss_total > 0 THEN
        |    round((rss_total - rss_split) / rss_total, 6) END
        |    AS var_reduction
        |FROM r WHERE pick = 1 ORDER BY event_type""".stripMargin)
}
