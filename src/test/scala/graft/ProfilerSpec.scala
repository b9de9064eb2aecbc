package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{ProfileConfig, Profiler}

class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profileMap(df: org.apache.spark.sql.DataFrame,
      cfg: ProfileConfig = ProfileConfig()): Map[(String, String), Option[Double]] =
    Profiler.numericProfile(df, cfg).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  test("numericMoments equals the moments slice of the full profile (both modes)") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    for (exact <- Seq(true, false)) {
      val cfg = ProfileConfig(exact = exact)
      val moments = Profiler.numericMoments(df, cfg).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      val slice = profileMap(df, cfg)
        .filter { case ((_, metric), _) => Profiler.momentMetrics.contains(metric) }
      assert(moments == slice, s"moments tier diverged from full profile (exact=$exact)")
    }
  }

  test("numericProfile: stats on a known column") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val m = profileMap(df)
    assert(m(("x", "count")) == Some(4.0))
    assert(m(("x", "null_count")) == Some(0.0))
    assert(m(("x", "min")) == Some(1.0))
    assert(m(("x", "max")) == Some(4.0))
    assert(m(("x", "mean")) == Some(2.5))
    assert(m(("x", "median")) == Some(2.5)) // interpolated, pandas/DuckDB style
    assert(m(("x", "p25")) == Some(1.75))
    assert(m(("x", "distinct_count")) == Some(4.0))
    // sample stddev (ddof=1) like pandas .std()
    assert(math.abs(m(("x", "stddev")).get - 1.2910) < 1e-4)
  }

  test("numericProfile: NaN is treated as NULL (pandas skipna parity)") {
    val df = Seq(1.0, Double.NaN, 3.0).toDF("x")
    val m = profileMap(df)
    assert(m(("x", "count")) == Some(2.0))
    assert(m(("x", "null_count")) == Some(1.0))
    assert(m(("x", "mean")) == Some(2.0))
    assert(m(("x", "distinct_count")) == Some(2.0))
  }

  test("numericProfile: all-null and empty inputs keep the full metric grid") {
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    val m = profileMap(allNull)
    assert(m(("x", "count")) == Some(0.0))
    assert(m(("x", "null_count")) == Some(2.0))
    assert(m(("x", "min")) == None)

    val empty = Seq.empty[Double].toDF("x")
    val me = profileMap(empty)
    assert(me.size == Profiler.numericMetrics.size) // grid is total
    assert(me(("x", "count")) == Some(0.0))
    assert(me(("x", "median")) == None)
  }

  test("numericProfile: approx mode emits the same metric grid") {
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val m = profileMap(df, ProfileConfig(exact = false))
    assert(m.keySet == Profiler.numericMetrics.map(("x", _)).toSet)
    assert(m(("x", "distinct_count")) == Some(3.0))
  }

  test("numericProfile: invariants hold on mixed data") {
    val df = Seq((1, 10.5), (2, -3.0), (3, 7.25), (4, -3.0), (5, 0.0))
      .toDF("id", "v")
    val m = profileMap(df)
    for (c <- Seq("id", "v")) {
      val cnt = m((c, "count")).get + m((c, "null_count")).get
      assert(cnt == 5.0)
      assert(m((c, "min")).get <= m((c, "median")).get)
      assert(m((c, "median")).get <= m((c, "max")).get)
      assert(m((c, "p25")).get <= m((c, "p75")).get)
    }
  }

  test("nullCounts counts NULL and NaN for floating columns only") {
    val df = Seq(
      (Some(1.0), Some("a")),
      (Some(Double.NaN), None),
      (None, Some("c"))).toDF("d", "s")
    val r = Profiler.nullCounts(df).collect().head
    assert(r.getAs[Long]("null_d") == 2L) // NULL + NaN
    assert(r.getAs[Long]("null_s") == 1L)
  }

  test("duplicateStats") {
    val df = Seq((1, "a"), (1, "a"), (2, "b"), (3, "c"), (3, "c"), (3, "c"))
      .toDF("k", "v")
    val r = Profiler.duplicateStats(df, Seq("k", "v")).collect().head
    assert(r.getAs[Long]("row_count") == 6L)
    assert(r.getAs[Long]("distinct_count") == 3L)
    assert(r.getAs[Long]("duplicate_count") == 3L)
    assert(r.getAs[Long]("duplicate_groups") == 2L)
  }

  test("numericHistogram: buckets cover the range, max lands in last bucket") {
    val df = (0 until 100).map(_.toDouble).toDF("x")
    val h = Profiler.numericHistogram(df, "x", 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == (0L until 10L).toSet)
    assert(h.values.sum == 100L)
    assert(h(9L) == 10L) // 90..99, with 99 (the max) in bucket 9 not 10
  }

  test("numericHistogram: constant column lands wholly in bucket 0") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    val h = Profiler.numericHistogram(df, "x", 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(h.toSeq == Seq(0L -> 3L)) // hi == lo: no NaN buckets from 0/0
  }

  test("categoricalHistogram: ordered by count desc then value") {
    val df = Seq("a", "b", "b", "c", "c").toDF("x")
    val h = Profiler.categoricalHistogram(df, "x", 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(h.toSeq == Seq(("b", 2L), ("c", 2L), ("a", 1L)))
  }
}
