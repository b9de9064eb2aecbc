package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: executed-plan shapes of selected queries. */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q67_incremental_dedup", "q69_mixture_rebalance").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"=== $q ===")
      println(p.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Window"))
        .map(_.trim.take(120)).mkString("\n"))
    }
    spark.stop()
  }
}
