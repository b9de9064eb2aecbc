package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: candidate-pair counts and timings of the n-gram
  * Jaccard dedup path on a fixture dir.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, TextOps}
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val s = Dedup.shingled(docs, "source") // hashed longs
    time("shingled")(s.count())
    val ex = s.select(col("block"), col("doc_id"), explode(col("shingles")).as("sh"))
    time("exploded")(ex.count())
    time("join-hashed")(ex.as("a").join(ex.as("b"),
      col("a.block") === col("b.block") && col("a.sh") === col("b.sh") &&
      col("a.doc_id") < col("b.doc_id")).count())
    // string-shingle comparison (the pre-hash formulation)
    val sStr = docs.select(col("doc_id"), col("source").as("block"),
      TextOps.ngrams(col("text"), 2).as("shingles"))
    val exStr = sStr.select(col("block"), col("doc_id"), explode(col("shingles")).as("sh"))
    time("join-string")(exStr.as("a").join(exStr.as("b"),
      col("a.block") === col("b.block") && col("a.sh") === col("b.sh") &&
      col("a.doc_id") < col("b.doc_id")).count())
    time("pairs-agg")(ex.as("a").join(ex.as("b"),
      col("a.block") === col("b.block") && col("a.sh") === col("b.sh") &&
      col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1))).count())
    time("full")(Dedup.jaccardPairs(docs, "source", 0.5).count())
    spark.stop()
  }
}
