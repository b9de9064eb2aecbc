package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: LSH-bucket pair counts per plane count. */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    for (np <- Seq(1, 2, 3, 4, 6)) {
      val b = e.withColumn("__bucket",
        graft.operators.Similarity.lshBucket(col("embedding").cast("array<double>"), np, 64))
      val pairs = graft.operators.Similarity.nearDupPairs(b, "__bucket", 0.45)
      println(s"nPlanes=$np pairs=" + pairs.count())
    }
    spark.stop()
  }
}
