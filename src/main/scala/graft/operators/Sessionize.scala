package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the batch form of
  * session windows (Structured Streaming's `session_window` is the
  * streaming twin; this one is oracle-checkable and replayable).
  *
  * Extends the reference's time-dimension handling (scheduled interval
  * monitors, `/root/reference/databand_airflow_monitor.py:13,102-110`)
  * to the event-level sessions a training-data/behavioral pipeline needs.
  *
  * Scale shape: ONE shuffle (hash by user) + one per-user sort. Both
  * window functions (lag gap-flag, running session counter) share the
  * same (partition, ordering), so Catalyst plans a single Window operator
  * over a single sort — no second exchange. Skewed users (bots) bound the
  * partition; cap with a per-user event limit upstream if needed.
  */
object Sessionize {

  /** Assign a session index per user: a new session starts after a gap of
    * more than `gapSeconds` since the previous event. Ordering ties are
    * broken by `idCol` so the assignment is total and deterministic.
    * Gaps are computed on whole epoch seconds (`unix_timestamp`), which
    * matches DuckDB's `date_diff('second', ...)` boundary counting.
    */
  def assignSessions(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val byTime = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val gap: Column = unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(byTime))
    events
      .withColumn("__new_session",
        when(lag(col(tsCol), 1).over(byTime).isNull || gap > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum("__new_session").over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session rollup: event count, span in seconds, summed value. */
  def sessionSummary(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value"): DataFrame =
    assignSessions(events, gapSeconds, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_sec"),
        round(sum(col(valueCol)), 2).as("sum_value"))
}
