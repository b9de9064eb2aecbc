package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Anomaly

/** Round-7 part fourteen: seasonality-adjusted volume anomalies. */
object Round7sQueries {

  val SeasonalThresholdPermille = 300L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q218_seasonal_residuals" -> ((s, dir) =>
      Anomaly.seasonalResidualReport(Tables.load(s, dir, "events"),
        "event_type", thresholdPermille = SeasonalThresholdPermille)))

  val oracleSql: Map[String, String] = Map(
    "q218_seasonal_residuals" ->
      s"""WITH d AS (SELECT event_type AS key,
         |    date_trunc('day', ts)::DATE AS day,
         |    CAST(count(*) AS BIGINT) AS volume
         |  FROM events GROUP BY 1, 2),
         |dd AS (SELECT *, CAST(dayofweek(day) AS INTEGER) AS dow FROM d),
         |p AS (SELECT key, dow,
         |    CAST(sum(volume) // count(*) AS BIGINT) AS dow_mean_floor
         |  FROM dd GROUP BY 1, 2)
         |SELECT dd.key AS event_type, dd.day, dd.dow, dd.volume,
         |  p.dow_mean_floor,
         |  CAST(dd.volume - p.dow_mean_floor AS BIGINT) AS residual,
         |  abs(dd.volume - p.dow_mean_floor) * 1000 >
         |    p.dow_mean_floor * $SeasonalThresholdPermille AS flagged
         |FROM dd JOIN p ON p.key = dd.key AND p.dow = dd.dow
         |ORDER BY event_type, day""".stripMargin)
}
