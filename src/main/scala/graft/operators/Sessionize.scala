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

  /** Top common session OPENINGS — "what journeys do users actually
    * take": each session's first `pathLen` event types in event order,
    * joined `a>b>c`, censused across all sessions, top-N by frequency.
    * The product-analytics path report (the Sankey diagram's data).
    *
    * Scale shape: sessions are HIGH-cardinality keys, so the per-
    * session row_number window partitions evenly (the q07 argument —
    * per-KEY windows belong where group count is high); the path
    * build is sort_array over ≤ pathLen collected structs per session
    * (bounded payload, deterministic despite collect_list's order);
    * the census is path-grain — bounded by |type vocab|^pathLen — and
    * the share window + TakeOrdered run over census rows only.
    *
    * Output (rank 1..topN by (n_sessions DESC, path)): (rank, path,
    * n_sessions, share_ppm) — share of ALL sessions, exact ppm.
    */
  def topPaths(events: DataFrame, gapSeconds: Long, pathLen: Int = 3,
      topN: Int = 10, userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(pathLen >= 1 && topN >= 1, "pathLen/topN")
    val w = Window.partitionBy(col(userCol), col("session_idx"))
      .orderBy(col(tsCol), col(idCol))
    val census = assignSessions(events, gapSeconds, userCol, tsCol, idCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= pathLen)
      .groupBy(col(userCol), col("session_idx"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__rn"), col(typeCol).as("t")))),
        s => s("t")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
    census
      .withColumn("share_ppm",
        expr("(n_sessions * 1000000L) div " +
          "(sum(n_sessions) over ())"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n_sessions").desc,
          col("path"))).cast("int"))
      .select("rank", "path", "n_sessions", "share_ppm")
  }
}
