package graft.run

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.core.{MetricSink, ProfileConfig, Profiler}
import graft.state.StateStore
import graft.storage.StorageMonitor

/** Work-avoidance via state (SURVEY §4.1): profile only the tables whose
  * FILES changed since the last recorded run.
  *
  * The reference recomputes only deltas against its stored previous state
  * (`/root/reference/Snowflake/snowflake_table_monitor.py:97-113`); this
  * generalizes that to file granularity — the cheap file-metadata
  * inventory (one listing, no data read) is compared against a per-table
  * mtime watermark in the [[StateStore]], and unchanged tables are
  * skipped WITHOUT scanning a single row. At 100 TB, where daily churn
  * touches a few percent of tables/partitions, this turns a full-lake
  * profiling sweep into a churn-sized one.
  */
object IncrementalMonitor {

  private val WatermarkKey = "last_profiled_src_mtime_ms"

  /** Latest file modification time per table, from the distributed
    * inventory listing (metadata only — no table scan).
    */
  def sourceMtimes(spark: SparkSession, dir: String,
      tables: Seq[String]): Map[String, Long] = {
    val inv = StorageMonitor.inventory(spark, tables.map(t => Tables.path(dir, t)))
    val rows = inv.groupBy("root")
      .agg(org.apache.spark.sql.functions.max("modification_ms").as("m"))
      .collect()
    val byRoot = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    tables.flatMap(t => byRoot.get(Tables.path(dir, t)).map(t -> _)).toMap
  }

  /** Tables whose newest file is newer than the stored watermark (or that
    * have never been profiled).
    */
  def changedTables(spark: SparkSession, dir: String, tables: Seq[String],
      state: StateStore): Seq[String] = {
    val mtimes = sourceMtimes(spark, dir, tables)
    tables.filter { t =>
      val cur = mtimes.getOrElse(t, Long.MaxValue)
      state.get(spark, t, WatermarkKey).map(_.toLong).forall(_ < cur)
    }
  }

  /** Profile changed tables only; advance each table's watermark after a
    * successful profile. Returns the profiled subset.
    */
  def run(spark: SparkSession, dir: String, tables: Seq[String],
      state: StateStore, sink: MetricSink,
      cfg: ProfileConfig = ProfileConfig()): Seq[String] = {
    val mtimes = sourceMtimes(spark, dir, tables)
    val changed = changedTables(spark, dir, tables, state)
    changed.foreach { t =>
      Profiler.profileTo(sink, t, Tables.load(spark, dir, t), cfg)
      mtimes.get(t).foreach(m => state.put(spark, t, WatermarkKey, m.toString))
    }
    sink.log("incremental.tables_total", tables.size.toDouble)
    sink.log("incremental.tables_profiled", changed.size.toDouble)
    sink.log("incremental.tables_skipped", (tables.size - changed.size).toDouble)
    changed
  }
}
