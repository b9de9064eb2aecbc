package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-export ordering: the final step of a corpus build is a
  * deterministic global shuffle — every example gets a reproducible
  * pseudo-random position, materialized as N shard files each
  * internally ordered, so a trainer streams shard 0..N-1 sequentially
  * and sees the corpus in shuffled order without any runtime shuffle
  * buffer. (The reference pipelines stop at monitored tables; this is
  * the standard hand-off their downstream consumers implement.)
  *
  * Determinism: position comes from the same Knuth multiplicative hash
  * as [[Sampling.idHash]] — seed-offset, pure column arithmetic, so
  * re-runs (and the DuckDB oracle) place every row identically.
  *
  * Scale shape: shard assignment and order keys are scan-stage
  * expressions (zero shuffle); the write path is ONE
  * `repartition(numShards, shard)` — each output task sorts only its
  * own shard (corpus/numShards rows, the unit sized to fit an executor
  * by construction: shard count is chosen as corpus_size/shard_size).
  * There is no global sort and no low-cardinality window anywhere.
  */
object Export {

  /** Deterministic shuffled position: hash of (id + seed), [0, 1e9+7). */
  def orderKey(id: Column, seed: Long): Column =
    Sampling.idHash(id + lit(seed))

  /** Adds `shard` (hash % numShards) and `ord` (the within-shard order
    * key). Pure projection — composes with any upstream plan without a
    * shuffle.
    */
  def assignTrainingOrder(df: DataFrame, numShards: Int, seed: Long = 0L,
      idCol: String = "doc_id"): DataFrame = {
    val h = orderKey(col(idCol), seed)
    df.withColumn("ord", h)
      .withColumn("shard", pmod(col("ord"), lit(numShards.toLong)))
  }

  /** Writes the shuffled corpus as one directory per shard
    * (`shard=K/part-*.parquet`), rows inside each shard ordered by
    * (ord, id). repartition co-locates each shard on one task;
    * sortWithinPartitions orders it; partitionBy routes the directory
    * layout — Catalyst sees partition columns already clustered, so no
    * extra exchange.
    */
  def writeTrainingShards(df: DataFrame, numShards: Int, path: String,
      seed: Long = 0L, idCol: String = "doc_id"): Unit =
    assignTrainingOrder(df, numShards, seed, idCol)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Per-shard manifest: row/char totals plus the first and last
    * document in stream order — the bounds a trainer checkpoint
    * records. Aggregate-only (min/max over a (ord, id) struct is the
    * deterministic argmin/argmax), so the manifest never sorts data
    * rows.
    */
  def shardStats(df: DataFrame, numShards: Int, seed: Long = 0L,
      idCol: String = "doc_id", weightCol: String = "n_chars"): DataFrame =
    assignTrainingOrder(df, numShards, seed, idCol)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(weightCol).cast("long").as("total_weight"),
        min(struct(col("ord"), col(idCol))).getField(idCol).as("first_doc"),
        max(struct(col("ord"), col(idCol))).getField(idCol).as("last_doc"))
}
