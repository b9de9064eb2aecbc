package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.catalog.CatalogMonitor

/** Round-10 part four: the parquet-footer row-count fast path.
  * SURVEY §4.2's metadata-only option for plain counts, now real: the
  * flag flips `tableRowCounts` from one count job per table to direct
  * footer sums. The spec pins (a) value equality with the count-job
  * path — so the q18 oracle hash is flag-independent — and (b) that the
  * footer path performs ZERO file-input IO on the executors: no task
  * reads a byte or a record from any data file.
  */
class Round10dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withFooterFlag[T](on: Boolean)(body: => T): T = {
    val key = CatalogMonitor.FooterCountsKey
    val old = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** (input bytes, input records, tasks) across all tasks in `body`. */
  private def taskInput(body: => Unit): (Long, Long, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.inputMetrics.bytesRead)
          recs.addAndGet(m.inputMetrics.recordsRead)
          tasks.incrementAndGet()
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(1500) }
    finally spark.sparkContext.removeSparkListener(l)
    (bytes.get, recs.get, tasks.get)
  }

  test("footer path returns exactly the count-job path's relation") {
    val jobs = withFooterFlag(on = false) {
      CatalogMonitor.tableRowCounts(spark, sf).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
    }
    val footers = withFooterFlag(on = true) {
      CatalogMonitor.tableRowCounts(spark, sf).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
    }
    assert(jobs.nonEmpty && footers === jobs, s"jobs=$jobs footers=$footers")
  }

  test("footer path reads zero data bytes and zero records on the " +
    "executors (metadata-only, q18 shape)") {
    var rows: Long = 0L
    val (bytes, recs, _) = taskInput {
      rows = withFooterFlag(on = true) {
        CatalogMonitor.tableRowCounts(spark, sf).collect().length.toLong
      }
    }
    assert(rows === Tables.all.size.toLong)
    assert(bytes === 0L && recs === 0L,
      s"footer path must not scan: bytesRead=$bytes recordsRead=$recs")
  }

  test("count-job control: the default path DOES schedule scan tasks " +
    "(the contrast that makes the zero-IO assertion meaningful)") {
    val (_, _, tasks) = taskInput {
      withFooterFlag(on = false) {
        CatalogMonitor.tableRowCounts(spark, sf).collect()
      }
    }
    assert(tasks > 0L, "expected at least one task on the count-job path")
  }
}
