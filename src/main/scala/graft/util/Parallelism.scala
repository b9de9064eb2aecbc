package graft.util

import org.apache.spark.sql.DataFrame

/** Guard against under-partitioned scans feeding compute-heavy stages.
  *
  * Parquet parallelism is bounded by ROW GROUPS, not byte splits: a
  * single-row-group file (small fixture exports, badly-written upstream
  * data) is read by exactly one task, so everything fused into the scan
  * stage — explodes, hashes, melts, partial aggregates — runs on one
  * core no matter the cluster size. [[ensure]] repartitions ONLY when
  * the current partition count is below the session's default
  * parallelism; a healthy 100 TB table (thousands of row groups) passes
  * through untouched, so the shuffle cost is paid exactly when it buys
  * parallelism.
  */
object Parallelism {

  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
