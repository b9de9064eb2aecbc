package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.run.MonitorRunner
import graft.storage.StorageMonitor

/** Round-11 additions: the compaction EXECUTOR round-trip (q275) — the
  * OPTIMIZE job the q274 planner plans, run end-to-end: stage the
  * events table as small per-shard files, plan bins, read every bin
  * and write ONE file per bin, then grade the ACTUAL output. Row
  * conservation is the hashable value (the oracle recomputes it from
  * the source table, so a row lost anywhere in stage→plan→compact→
  * read-back flips the hash); the bin-count laws ride certain-true
  * flags because absolute bin counts depend on parquet encoding sizes
  * no oracle can see: next-fit guarantees bins ≤ files and — since a
  * bin's bytes never exceed target + its oversized last file —
  * bins ≥ ceil(bytes / (target + max_file_bytes)); the executor
  * guarantees one output file per bin.
  */
object Round11Queries {

  /** Shard count for the staged small-files layout: one file per
    * shard by construction (repartition by the shard column before a
    * partitionBy write), so `n_files_in` is a constant both engines
    * state independently.
    */
  val CompactShards = 8

  /** Executor bin target — small enough that several bins form from
    * the staged shards at the gate SF.
    */
  val CompactExecTargetBytes = 262144L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The O1/O2 orchestration surface ORACLED end-to-end: the fan-out
    // runner monitors every warehouse table concurrently into the
    // shared sink (S15), and the fan-in aggregate recomputes the
    // Snowflake DAG's XCom mean. Hashable projection: the per-table
    // record counts plus the fan-in mean in CENTS — the sink stores
    // rint(mean*100)/100 and rint is half-even, which DuckDB states as
    // round_even; mean*100 = sum*100/8 is exact in doubles, so both
    // engines round the identical value. Fresh temp state per call, so
    // no delta keys; the key filter makes the projection deterministic
    // under the runner's thread-ordering.
    "q276_monitor_fanout_fanin" -> ((s, dir) => {
      val statePath = java.nio.file.Files
        .createTempDirectory("graft-q276").toFile.getAbsolutePath
      MonitorRunner.run(s, dir, Tables.warehouse, statePath)
        .filter(col("key").endsWith(".record_count") ||
          col("key") === "all_tables.mean_record_count")
        .select(col("key"),
          round(col("valueDouble") * 100).cast("long").as("value_cents"))
        .orderBy("key")
    }),

    "q275_compaction_execute" -> ((s, dir) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-q275").toFile.getAbsolutePath
      try {
        val staged = s"$tmp/staged"
        val out = s"$tmp/out"
        Tables.load(s, dir, "events")
          .withColumn("__shard",
            pmod(col("user_id"), lit(CompactShards.toLong)))
          .repartition(col("__shard"))
          .write.partitionBy("__shard").parquet(staged)
        val inv = StorageMonitor.inventory(s, Seq(staged))
          .filter(col("extension") === "parquet")
        val maxFile = inv.agg(max(col("size_bytes").cast("long")))
          .head().getLong(0)
        val manifest = StorageMonitor
          .compact(s, inv, CompactExecTargetBytes, out)
          .collect() // bin grain: stat rows
        val nBins = manifest.length.toLong
        val filesIn = manifest.map(_.getAs[Long]("n_files_in")).sum
        val bytesIn = manifest.map(_.getAs[Long]("bytes_in")).sum
        val filesOut = manifest.map(_.getAs[Long]("n_files_out")).sum
        val rows = manifest.map(_.getAs[Long]("n_rows")).sum
        // next-fit lower bound: a bin holds < target + maxFile bytes
        // (it closes at the first file crossing a target boundary, and
        // only its LAST file can overshoot), so bins >= ceil(B/(t+max))
        // — certain at every SF, unlike ceil(B/t), which oversized
        // single files break by skipping bin ids
        val minBins = (bytesIn + CompactExecTargetBytes + maxFile - 1) /
          (CompactExecTargetBytes + maxFile)
        s.createDataFrame(
          s.sparkContext.parallelize(Seq(Row(
            filesIn.toInt, rows,
            filesOut == nBins,
            nBins >= minBins,
            nBins <= filesIn)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("n_files_in",
              org.apache.spark.sql.types.IntegerType, nullable = false),
            org.apache.spark.sql.types.StructField("total_rows",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("one_file_per_bin",
              org.apache.spark.sql.types.BooleanType, nullable = false),
            org.apache.spark.sql.types.StructField("bins_lower_ok",
              org.apache.spark.sql.types.BooleanType, nullable = false),
            org.apache.spark.sql.types.StructField("bins_upper_ok",
              org.apache.spark.sql.types.BooleanType, nullable = false))))
      } finally {
        // the result row is materialized — the staging tree can go
        graft.util.TempDirs.rm(tmp)
      }
    }))

  val oracleSql: Map[String, String] = Map(
    "q276_monitor_fanout_fanin" -> {
      val unions = Tables.warehouse.map(t =>
        s"SELECT '$t' AS t, CAST(count(*) AS BIGINT) AS cnt FROM $t")
        .mkString("\nUNION ALL ")
      s"""WITH c AS ($unions),
         |m AS (SELECT CAST(round_even(sum(cnt) * 100.0 / count(*), 0)
         |    AS BIGINT) AS cents FROM c)
         |SELECT t || '.record_count' AS key, cnt * 100 AS value_cents
         |FROM c
         |UNION ALL
         |SELECT 'all_tables.mean_record_count', cents FROM m
         |ORDER BY key""".stripMargin
    },

    "q275_compaction_execute" ->
      s"""SELECT CAST($CompactShards AS INTEGER) AS n_files_in,
         |  CAST(count(*) AS BIGINT) AS total_rows,
         |  TRUE AS one_file_per_bin,
         |  TRUE AS bins_lower_ok,
         |  TRUE AS bins_upper_ok
         |FROM events""".stripMargin)
}
