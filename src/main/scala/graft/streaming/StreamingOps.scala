package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the batch pipeline operators: exact dedup and
  * gap-based sessionization over an unbounded stream.
  *
  * Both are watermark-bounded — the only way their state stays finite on
  * an unbounded stream. The batch forms ([[graft.operators.Dedup]],
  * [[graft.operators.Sessionize]]) are the oracle-checkable equivalents;
  * these run continuously with `readStream`/`writeStream`.
  */
object StreamingOps {

  /** Streaming exact dedup: keep the FIRST occurrence of each key seen
    * within the watermark horizon; keys older than the horizon are
    * evicted from state, so state size is bounded by the horizon's key
    * arrival rate, not by stream lifetime. The batch equivalent is
    * `Dedup.dropExactDuplicates` (keep min-id per fingerprint).
    */
  def dropDuplicatesStream(events: DataFrame, keyCols: Seq[String],
      tsCol: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming gap-based sessions via Spark's native `session_window`:
    * events within `gap` of each other merge into one session per user;
    * a session closes (and emits, in append mode) once the watermark
    * passes its end. The batch equivalent is `Sessionize.sessionSummary`.
    */
  def sessionStream(events: DataFrame, gap: String, watermarkDelay: String,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
