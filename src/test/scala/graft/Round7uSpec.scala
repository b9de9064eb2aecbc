package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Deciles, TimeSeries}

/** Round-7 part sixteen: cross-correlation + weighted median. */
class Round7uSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("crossCorrelation: a planted 2-day lag peaks at lag 2") {
    import spark.implicits._
    // series a: a distinctive daily pattern; series b = a shifted by
    // 2 days — corr at lag 2 is exactly 1
    val pat = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7)
    val ev = pat.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(_ => ("a", ts(f"2024-01-${i + 1}%02d 10:00:00"))) ++
        (1 to n).map(_ => ("b", ts(f"2024-01-${i + 3}%02d 10:00:00")))
    }.toDF("event_type", "ts")
      .withColumn("user_id", lit(1L))
    val r = TimeSeries.crossCorrelation(ev, "event_type", "a", "b", 3)
      .collect().map(x => x.getInt(0) ->
        (x.getDouble(2), x.getBoolean(3))).toMap
    assert(r(2) == (1.0, true))
    assert(!r(0)._2 && !r(-2)._2)
    assert(r(0)._1 < 1.0)
    graft.util.Caches.releaseAll()
  }

  test("weightedMedian: token mass moves the median; ties pick smallest") {
    import spark.implicits._
    // values 1..4 with weights concentrating mass on 4
    val df = Seq(("s", 1L, 1L), ("s", 2L, 1L), ("s", 3L, 1L),
      ("s", 4L, 7L)).toDF("g", "v", "w")
    val r = Deciles.weightedMedian(df, "g", "v", "w").collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 10L)
    // cum weights 1,2,3,10; threshold (10+1) div 2 = 5 -> v = 4
    assert(r.getLong(3) == 4L)
    // unweighted median would be 2 (exact census pick on counts)
    val uw = Seq(("s", 1L, 1L), ("s", 2L, 1L), ("s", 3L, 1L),
      ("s", 4L, 1L)).toDF("g", "v", "w")
    assert(Deciles.weightedMedian(uw, "g", "v", "w").collect()
      .head.getLong(3) == 2L)
  }
}
