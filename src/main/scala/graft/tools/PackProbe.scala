package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: partition distribution of the packing stage. */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), lit("one").as("source"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    val out = graft.operators.Pack.assignShards(docs, 1024L, "source", buckets = 8)
    println("rdd partitions: " + out.rdd.getNumPartitions)
    val rows = out.select(spark_partition_id().as("pid"), col("shard")).collect().map(_.getInt(0))
    println("pid histogram: " + rows.groupBy(identity).view.mapValues(_.length).toMap)
    println(out.queryExecution.executedPlan)
    spark.stop()
  }
}
