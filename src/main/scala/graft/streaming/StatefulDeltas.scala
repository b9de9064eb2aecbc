package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One row-count observation for a monitored entity (table, prefix, ...). */
case class CountObs(entity: String, cnt: Long)

/** Emitted change record: the streaming form of the reference's
  * Variable-backed delta (`/root/reference/Snowflake/snowflake_table_monitor.py:97-113`),
  * with the corrected `current - previous` sign (SURVEY §7.4).
  */
case class CountDelta(entity: String, prev_count: Long, cur_count: Long, delta: Long)

/** Streaming change detection with per-key state (SURVEY O4 extension).
  *
  * The batch tier persists previous counts in the StateStore between runs;
  * this tier keeps them in the Structured Streaming state store instead,
  * so a continuously-running monitor emits a delta the moment a new
  * observation arrives. State is one long per entity — bounded by the
  * number of monitored entities, not by data volume, so the state store
  * stays tiny at any scale.
  */
object StatefulDeltas {

  def countDeltas(obs: Dataset[CountObs]): Dataset[CountDelta] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.entity)
      .flatMapGroupsWithState[Long, CountDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: String, rows: Iterator[CountObs], state: GroupState[Long]) =>
          var prev = state.getOption
          val out = rows.map { r =>
            val p = prev.getOrElse(r.cnt) // first observation: delta 0
            prev = Some(r.cnt)
            state.update(r.cnt)
            CountDelta(entity, p, r.cnt, r.cnt - p)
          }.toVector
          out.iterator
      }
  }
}
