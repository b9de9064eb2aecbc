package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway A/B: numericProfile input-sharing variants on lineitem.
  * Usage: runMain graft.tools.ProfVariants <sfDir>
  */
object ProfVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t).count())
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"PV $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.sharedState.cacheManager.clearCache()
        graft.util.Caches.releaseAll()
      }
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    time("current")(graft.core.Profiler.numericProfile(li))
    time("checkpoint-shared") {
      val shared = graft.util.Parallelism.ensure(li).localCheckpoint()
      graft.core.Profiler.numericProfile(shared)
    }
    time("cache-shared") {
      val shared = graft.util.Caches.cached(graft.util.Parallelism.ensure(li))
      graft.core.Profiler.numericProfile(shared)
    }
    spark.stop()
  }
}
