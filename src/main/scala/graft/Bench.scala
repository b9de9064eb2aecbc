package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

object Bench {
  /** /proc/loadavg sample: (la1, la5, la15, runnable/total threads). */
  private def loadavg(): String =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
      val f = s.split("\\s+")
      s"""{"la1":${f(0)},"la5":${f(1)},"la15":${f(2)},"procs":"${f(3)}"}"""
    } catch { case NonFatal(_) => """{"la1":-1}""" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/codegen/parquet-footer startup otherwise
    // lands entirely on whichever query happens to run first
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators that cache self-joined intermediates (dedup LSH) would
      // otherwise carry storage pressure into later measurements
      spark.sharedState.cacheManager.clearCache()
      graft.util.Caches.releaseAll()
      dt
    }
    // Fixed CALIBRATION query — the q02 shape (bare filter+project+count
    // on lineitem), re-timed every `calEvery` queries. Its intrinsic
    // cost is constant across the run, so any drift in its timeline IS
    // host contention, visible in-band: a round whose per-query numbers
    // moved can be adjudicated from the artifact alone instead of by
    // cross-round forensics.
    val calibrate: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(org.apache.spark.sql.functions.col("l_quantity") < 10)
        .select("l_orderkey", "l_quantity")
    val calEvery = 20
    val cal = scala.collection.mutable.ArrayBuffer[(Int, Double, String)]()
    def calPoint(pos: Int): Unit =
      cal += ((pos, timeOnce(calibrate), loadavg()))
    // unrecorded warmup of the calibration shape: JIT + codegen-cache
    // cold-start would otherwise inflate calibration[0], making the
    // timeline read as early contention on a quiet host
    timeOnce(calibrate)
    calPoint(0)
    // optional comma-separated query filter for local spot measurement
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // min-of-2 for EVERY query, with BOTH tries retained in the file
    // artifact: the host this runs on freezes the whole VM for
    // multi-second windows under load, and a sub-second query hit by one
    // freeze otherwise reads as a 3x regression across rounds — the
    // minimum is the intrinsic cost, the try spread is the contention
    // evidence.
    val tries = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    names.zipWithIndex.foreach { case ((name, fn), i) =>
      val t1 = timeOnce(fn); val t2 = timeOnce(fn)
      tries += name -> (t1, t2)
      if ((i + 1) % calEvery == 0) calPoint(i + 1)
    }
    calPoint(names.size)
    val results = tries.map { case (k, (a, b)) => k -> math.min(a, b) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // "method" records the timing protocol so cross-round comparisons stay
    // apples-to-apples: min-of-2 since round 4 (rounds 1-3 were single-run,
    // so their numbers include scheduler noise this protocol excludes)
    val calJson = cal.map { case (p, t, la) =>
      s"""{"pos":$p,"sec":$t,"load":$la}""" }.mkString("[", ",", "]")
    val calTimes = cal.map(_._2)
    val calSummary =
      s""""cal_min":${calTimes.min},"cal_max":${calTimes.max}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","method":"min_of_2",$calSummary}"""
    println(line)
    // The driver's BENCH artifact keeps only the tail of stdout, which
    // truncates the per-query map once there are 200+ queries — also
    // persist the full line PLUS the adjudication telemetry (per-try
    // times, calibration timeline, loadavg samples) to a file so every
    // number and its host-weather context survive the round.
    val triesJson = tries.map { case (k, (a, b)) =>
      s"\"" + k + s"\":[$a,$b]" }.mkString("{", ",", "}")
    val full = line.dropRight(1) +
      s""","tries":$triesJson,"calibration":$calJson}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_full.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (full + "\n").getBytes("UTF-8"))
    } catch { case NonFatal(_) => () } // stdout line remains the contract
    spark.stop()
  }
}
