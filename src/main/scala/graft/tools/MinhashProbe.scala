package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: stage-by-stage timings of the MinHash/LSH dedup
  * pipeline (shingle, signature, band join, verify) on a fixture dir.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, TextOps}
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val exploded = docs.select(col("doc_id"),
      explode_outer(TextOps.bigrams(col("text"))).as("s"))
    time("explode")(exploded.count())
    time("explode+hash")(exploded.withColumn("h", TextOps.rollingHash(col("s")))
      .agg(sum("h")).count())
    val sigs = Dedup.minhashSignatures(docs)
    time("signatures")(sigs.count())
    time("candidates")(Dedup.lshCandidates(Dedup.minhashSignatures(docs)).count())
    time("full")(Dedup.minhashNearDups(docs).count())
    spark.stop()
  }
}
