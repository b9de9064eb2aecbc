package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.MomentState

/** Round-7 part nine: mergeable moment profiles. */
class Round7nSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("moment states merge exactly: any split, any order ≡ direct") {
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "value")
    val direct = MomentState.report(MomentState.state(ev))
      .collect().map(_.toSeq).toSeq
    // three uneven slices, merged in two different orders
    val s1 = MomentState.state(ev.filter(col("event_id") % 5 === 0))
    val s2 = MomentState.state(ev.filter(col("event_id") % 5 === 1))
    val s3 = MomentState.state(ev.filter(col("event_id") % 5 >= 2))
    val m123 = MomentState.report(MomentState.merge(Seq(s1, s2, s3)))
      .collect().map(_.toSeq).toSeq
    val m312 = MomentState.report(MomentState.merge(Seq(s3, s1, s2)))
      .collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && m123 == direct && m312 == direct)
    // merging a merged state with a fresh one also lands exactly
    val nested = MomentState.report(MomentState.merge(Seq(
      MomentState.merge(Seq(s1, s2)), s3))).collect().map(_.toSeq).toSeq
    assert(nested == direct)
  }

  test("NaN counts as null; null never reaches min/max/sums") {
    import spark.implicits._
    val df = Seq(Some(1.0), Some(3.0), None, Some(Double.NaN))
      .toDF("value")
    val r = MomentState.report(MomentState.state(df)).collect().head
    assert(r.getLong(1) == 2L)           // n: two real values
    assert(r.getLong(2) == 2L)           // null + NaN both count null
    assert(r.getLong(3) == 1000000L && r.getLong(4) == 3000000L)
    assert(r.getDouble(5) == 2.0)        // mean
    assert(r.getDouble(6) == 1.414214)   // stddev ddof=1 of {1,3}
  }
}
