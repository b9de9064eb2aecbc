package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: plan shape + partition distribution of the packing stage. */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = graft.SparkEntry.queries("q65_pack_shards")(spark, "/root/testdata/sf0.01")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    println("scans: " + "Scan parquet".r.findAllIn(p).size)
    println("reused: " + "ReusedExchange".r.findAllIn(p).size)
    println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet") || l.contains("Reused")).mkString("\n"))
    spark.stop()
  }
}
