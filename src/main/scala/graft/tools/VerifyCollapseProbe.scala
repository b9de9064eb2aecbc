package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: how far does per-distinct-content verification
  * collapse the LSH candidate-pair set? (doc pairs vs distinct
  * md5(text) pairs — the dedup-before-verify win on a corpus with
  * exact clones.)
  */
object VerifyCollapseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    val cands = Dedup.lshCandidates(Dedup.minhashSignatures(docs))
    val ck = docs.select(col("doc_id"), md5(col("text")).as("ck"))
    val t0 = System.nanoTime()
    val withKeys = cands
      .join(ck.select(col("doc_id").as("doc_a"), col("ck").as("cka")), "doc_a")
      .join(ck.select(col("doc_id").as("doc_b"), col("ck").as("ckb")), "doc_b")
    val nPairs = withKeys.count()
    val nContent = withKeys.select(
      least(col("cka"), col("ckb")).as("k1"),
      greatest(col("cka"), col("ckb")).as("k2")).distinct().count()
    println(f"PROBE pairs=$nPairs contentPairs=$nContent ratio=${nPairs.toDouble / nContent}%.1f  (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    spark.stop()
  }
}
