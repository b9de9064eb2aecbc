package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupConfig}

/** Round-4 queries: the production-capped dedup variants.
  *
  * q61 runs the MinHash near-dup pipeline with [[DedupConfig.Production]]
  * skew caps ON — the configuration a 100 TB run would use. The capped
  * pipeline is deliberately lossy (hot LSH buckets are skipped), so there
  * is no exact SQL oracle; the driver records a rows-only check and
  * DedupSpec asserts the capped output is a subset of the exact q34
  * output with bounded recall loss. Bench-wise the row exists so the
  * capped and uncapped pipelines are both measured every round.
  */
object Round4Queries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_minhash_capped" -> ((s, dir) =>
      Dedup.minhashNearDups(docs(s, dir),
        maxBucketSize = DedupConfig.Production.maxBucketSize)
        .orderBy("doc_a", "doc_b")))

  val oracleSql: Map[String, String] = Map.empty
}
