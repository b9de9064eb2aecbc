package graft.core

import java.time.Instant
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A single emitted metric point. Numeric and string payloads are kept in
  * separate nullable columns so the metrics table stays strongly typed
  * (the reference logs scalars, strings, tuples and dicts through one
  * `log_metric(key, value)` call — e.g.
  * `/root/reference/AWS_Redshift/redshift_database_monitor.py:72-116`,
  * `/root/reference/Snowflake/snowflake_table_monitor.py:83`).
  */
case class MetricRow(
    runId: String,
    ts: java.sql.Timestamp,
    key: String,
    valueDouble: Option[Double],
    valueString: Option[String])

/** Append-only metric sink (SURVEY S15/S16).
  *
  * Metrics are buffered driver-side (they are tiny — stat rows, never data
  * rows) and flushed as one Parquet append per run. Each run is stamped
  * with a `runId`, turning the metrics table into the time-series the
  * reference builds by POSTing points to the Databand tracker.
  */
class MetricSink(val runId: String) {
  private val buf = ArrayBuffer.empty[MetricRow]

  private def now = java.sql.Timestamp.from(Instant.now())

  def log(key: String, value: Double): Unit = synchronized {
    buf += MetricRow(runId, now, key, Some(value), None)
  }

  def logString(key: String, value: String): Unit = synchronized {
    buf += MetricRow(runId, now, key, None, Some(value))
  }

  def size: Int = synchronized(buf.size)

  def keys: Seq[String] = synchronized(buf.map(_.key).toSeq)

  def get(key: String): Option[MetricRow] = synchronized(buf.find(_.key == key))

  def toDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized(buf.toSeq).toDF()
  }

  /** Flush the buffered points to the metrics table (Parquet append). */
  def flush(spark: SparkSession, metricsPath: String): Unit = {
    toDf(spark).coalesce(1).write.mode("append").parquet(metricsPath)
    synchronized(buf.clear())
  }
}

object MetricSink {
  def apply(runId: String = java.util.UUID.randomUUID().toString): MetricSink =
    new MetricSink(runId)
}
