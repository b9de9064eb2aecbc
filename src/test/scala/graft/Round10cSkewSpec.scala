package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

/** Round-10 part three: PROOF that AQE's skew-join split actually
  * engages on the q04 join shape with a planted hot key — until now the
  * config was set (Bench, SparkEntry) and the salted fallback existed
  * (util.SkewJoin), but nothing demonstrated the runtime re-plan fires
  * and what it buys. The spec plants one key carrying ~83% of the fact
  * side, runs the same shuffle join with the skew optimizer off and on,
  * and checks three things: the final adaptive plan carries the
  * isSkewJoin flag, the listener-measured max/median task shuffle-read
  * ratio collapses, and row counts agree (the split changes the
  * schedule, never the relation). The salted fallback is held to the
  * same relation as the differential.
  */
class Round10cSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConfs[T](kv: (String, String)*)(body: => T): T = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Shuffle-read bytes of every shuffle-reading task during `body` —
    * the per-task load balance, measured, not inferred from the plan.
    */
  private def taskReadBytes(body: => Unit): Seq[Long] = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && m.shuffleReadMetrics.totalBytesRead > 0)
          buf.add(m.shuffleReadMetrics.totalBytesRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    // async listener bus: wait until it is actually empty (a fixed
    // sleep drops late TaskEnds under CI load)
    try { body; TestSpark.drainListenerBus() }
    finally spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    buf.asScala.map(_.longValue).toSeq
  }

  /** left: 600k rows, key 0 carries 500k (~83%); the hash payload
    * defeats shuffle compression enough for AQE's byte thresholds to
    * see the skew. right: one row per key — broadcast is disabled in
    * the test confs, so this forces the q04 shuffle-join shape.
    */
  private def planted() = {
    // 32 map partitions: AQE splits a skewed reduce partition at
    // map-output granularity, so few map tasks would cap the split at
    // few chunks no matter the advisory size
    val left = spark.range(0, 600000, 1, 32).select(
      when(col("id") < 500000, 0L)
        .otherwise(pmod(col("id"), lit(999L)) + 1).as("k"),
      hash(col("id")).as("payload"))
    val right = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 7).as("dim"))
    (left, right)
  }

  private def flat(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
    case q: QueryStageExec => flat(q.plan)
    case n => n +: (n.children ++ n.subqueries).flatMap(flat)
  }

  private def hasSkewSplit(p: SparkPlan): Boolean = flat(p).exists {
    case j: SortMergeJoinExec => j.isSkewJoin
    case j: ShuffledHashJoinExec => j.isSkewJoin
    case _ => false
  }

  private def ratio(reads: Seq[Long]): Double = {
    val s = reads.sorted
    s.max.toDouble / math.max(1L, s(s.size / 2)).toDouble
  }

  test("AQE skew-join: the planted-skew q04 shape splits the hot " +
    "partition (isSkewJoin in the final plan, task balance restored)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128k") {
      val (left, right) = planted()

      // skew optimizer OFF: the hot key lands on one reduce task
      val qeOff = withConfs(
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        left.join(right, Seq("k")).queryExecution
      }
      var offCount = 0L
      val offReads = taskReadBytes { offCount = withConfs(
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        qeOff.toRdd.count() } }
      assert(!hasSkewSplit(qeOff.executedPlan),
        "control run must not skew-split")

      // skew optimizer ON: same relation, re-planned at runtime
      val qeOn = left.join(right, Seq("k")).queryExecution
      var onCount = 0L
      val onReads = taskReadBytes { onCount = withConfs(
        "spark.sql.adaptive.skewJoin.enabled" -> "true") {
        qeOn.toRdd.count() } }

      assert(offCount === 600000L && onCount === offCount,
        "the split must not change the relation")
      assert(hasSkewSplit(qeOn.executedPlan),
        "expected isSkewJoin in the final adaptive plan:\n" +
          qeOn.executedPlan.toString.take(4000))

      // measured balance: one hot task vs many advisory-sized ones
      val (rOff, rOn) = (ratio(offReads), ratio(onReads))
      info(f"max/median task shuffle-read: off=$rOff%.1f " +
        f"(${offReads.size} tasks) on=$rOn%.1f (${onReads.size} tasks)")
      assert(offReads.max > 4 * onReads.max,
        s"hot task must shrink: off max=${offReads.max} on max=${onReads.max}")
      assert(rOff > 3 * rOn,
        f"balance must improve: off=$rOff%.1f on=$rOn%.1f")
    }
    graft.util.Caches.releaseAll()
  }

  test("salted fallback: saltedInnerJoin returns exactly the plain " +
    "join's relation on the planted-skew fixture") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val (left, right) = planted()
      val salted = graft.util.SkewJoin
        .saltedInnerJoin(left, right, Seq("k"), salts = 8)
      assert(salted.count() === 600000L)
      // aggregate equality (sum of a join-dependent product) — cheaper
      // than a full anti-join and sensitive to any lost/duplicated row
      val a = salted.agg(sum(col("payload") * col("dim"))).collect()(0)
      val b = left.join(right, Seq("k"))
        .agg(sum(col("payload") * col("dim"))).collect()(0)
      assert(a === b)
    }
    graft.util.Caches.releaseAll()
  }
}
