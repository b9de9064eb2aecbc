package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Guard against under-partitioned scans feeding compute-heavy stages.
  *
  * Parquet parallelism is bounded by ROW GROUPS, not byte splits: a
  * single-row-group file (small fixture exports, badly-written upstream
  * data) is read by exactly one task, so everything fused into the scan
  * stage — explodes, hashes, melts, partial aggregates — runs on one
  * core no matter the cluster size. [[ensure]] repartitions ONLY when
  * the scan's expected split count is below the session's default
  * parallelism; a healthy 100 TB table (thousands of row groups) passes
  * through untouched, so the shuffle cost is paid exactly when it buys
  * parallelism.
  *
  * The probe reads the OPTIMIZED plan's file index — after
  * PruneFileSourcePartitions, so a partition-pruned scan is estimated at
  * its pruned size, not the table total (the analyzed plan would
  * overestimate pruned scans and skip the repartition exactly when the
  * real scan is small) — and mirrors Spark's own
  * `FilePartition.maxSplitBytes` arithmetic. No physical planning and no
  * plan→RDD conversion, which the previous `df.rdd.getNumPartitions`
  * probe paid once per wrapped operator (a full extra QueryExecution down
  * to RDD lineage).
  */
object Parallelism {

  /** xxhash64 rejects MapType (unordered — no canonical hash). */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: ArrayType => containsMap(a.elementType)
    case _ => false
  }

  /** The guard's repartition, by a DETERMINISTIC hash key instead of
    * round-robin (round-15): `repartition(n)` pays a local sort of its
    * input inside the scan stage (sortBeforeRepartition, on by default
    * so retried tasks reproduce their row→partition assignment) — and
    * the guard fires exactly when that stage has almost no parallelism,
    * so the sort is nearly serial. Hashing `pmod(xxhash64(all cols),
    * 100·n)` is the guide-§2.5 deterministic synthetic key: no sort,
    * retry-safe by value, 100× more key values than partitions so the
    * spread stays even. Measured on lineitem sf0.1 (noop sink, 4 runs):
    * 1.00 s round-robin → 0.60 s hash for the scan+exchange leg.
    * Exact-duplicate rows share a key; the guard's callers feed it
    * row-unique relations (documents, embeddings, fact rows), and a
    * map-typed or empty schema falls back to round-robin.
    */
  private def spread(df: DataFrame, target: Int): DataFrame = {
    val hashable = df.schema.fields.toSeq
      .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
    if (hashable.isEmpty) df.repartition(target)
    else df.repartition(target,
      pmod(xxhash64(hashable: _*), lit(100L * target)))
  }

  def ensure(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val conf = spark.sessionState.conf
    val fileRelations = df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
    }
    if (fileRelations.nonEmpty) {
      // Spark packs splits of maxSplitBytes = min(maxPartitionBytes,
      // max(openCostInBytes, totalBytes/cores)); estimated task count =
      // ceil(total/maxSplit) per relation (file-boundary padding ignored —
      // a slight underestimate, erring toward repartitioning, which is
      // the safe direction for this guard).
      val est = fileRelations.map { r =>
        val total = math.max(1L, r.location.sizeInBytes)
        val bytesPerCore = total / math.max(1, target)
        val maxSplit = math.min(conf.filesMaxPartitionBytes,
          math.max(conf.filesOpenCostInBytes, bytesPerCore))
        (total + maxSplit - 1) / maxSplit
      }.sum
      if (est < target) spread(df, target) else df
    } else {
      // non-file source (local relation, jdbc): fall back to the RDD probe
      // — these are small driver-adjacent inputs where the conversion is
      // negligible
      if (df.rdd.getNumPartitions < target) spread(df, target) else df
    }
  }
}
