package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives SparkEntry.entry the way the driver's smoke check does. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[entry-smoke] rows=$n (driver requires > 0)")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
