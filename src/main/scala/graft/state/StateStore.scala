package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-run key-value state (SURVEY S17).
  *
  * The reference persists per-table state (previous record count, previous
  * column list) in Airflow Variables between scheduled runs
  * (`/root/reference/Snowflake/snowflake_table_monitor.py:97-113`). Here the
  * state is a Parquet table keyed by (entity, key) holding the latest
  * snapshot; updates are overwrite-by-key (read → anti-join old on new keys
  * → union → atomic swap via temp dir rename). State rows are metric-sized,
  * never data-sized, so the whole table is broadcast-joinable at any data
  * scale.
  */
class StateStore(path: String) {

  private val schemaDdl = "entity string, key string, value string, updated_ts timestamp"

  def read(spark: SparkSession): DataFrame = {
    val dir = new java.io.File(path)
    if (dir.exists() && dir.listFiles() != null && dir.listFiles().nonEmpty)
      spark.read.parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
  }

  /** Overwrite-by-key upsert: rows in `updates` replace same-(entity,key)
    * rows; everything else is carried forward.
    *
    * Synchronized on this store: the merge is a read-modify-write of the
    * whole snapshot, so two concurrent upserts (parallel monitors) would
    * each merge against the pre-state and the loser's rows would vanish.
    * Serializing on the instance makes each upsert atomic; callers that
    * need fewer rewrites should batch several keys into ONE upsert.
    */
  def upsert(spark: SparkSession, updates: DataFrame): Unit = synchronized {
    val old = read(spark)
    val merged = old.join(updates.select("entity", "key"), Seq("entity", "key"), "left_anti")
      .unionByName(updates)
      .cache()
    merged.count() // materialize before overwriting the source we read
    merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(path + ".tmp")
    merged.unpersist()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(path + ".tmp"), dst)
  }

  def get(spark: SparkSession, entity: String, key: String): Option[String] =
    synchronized {
      read(spark).filter(col("entity") === entity && col("key") === key)
        .select("value").collect().headOption.map(_.getString(0))
    }

  def put(spark: SparkSession, entity: String, key: String, value: String): Unit =
    putAll(spark, Seq((entity, key, value)))

  /** Batched put: one snapshot rewrite for any number of keys. */
  def putAll(spark: SparkSession, rows: Seq[(String, String, String)]): Unit = {
    import spark.implicits._
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    upsert(spark, rows.map { case (e, k, v) => (e, k, v, ts) }
      .toDF("entity", "key", "value", "updated_ts"))
  }
}

/** Change-detection operators over current vs previous snapshots
  * (SURVEY D1 row delta, E1 schema drift).
  */
object ChangeDetection {

  /** Row-count delta: `current - previous` as long. (The reference computes
    * `previous - current` on a stringly-typed Variable —
    * `/root/reference/Snowflake/snowflake_table_monitor.py:101-102` — a
    * latent type bug; we deliberately emit the corrected signed delta.)
    */
  def rowDelta(entity: String, prevCount: Long, curCount: Long,
      spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((entity, prevCount, curCount, curCount - prevCount))
      .toDF("entity", "prev_count", "cur_count", "delta")
  }

  /** Schema drift between two column sets: emits BOTH removed and added
    * columns (the reference only reports removed —
    * `/root/reference/Snowflake/snowflake_table_monitor.py:105` — noted in
    * SURVEY §7.4; we report the full symmetric difference).
    * Output: (change, column_name), ordered.
    */
  def schemaDrift(prevCols: Seq[String], curCols: Seq[String],
      spark: SparkSession): DataFrame = {
    import spark.implicits._
    val removed = prevCols.diff(curCols).map(("removed", _))
    val added = curCols.diff(prevCols).map(("added", _))
    (removed ++ added).toDF("change", "column_name")
      .orderBy("change", "column_name")
  }
}
