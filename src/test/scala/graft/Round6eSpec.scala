package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bootstrap, Privacy, TimeSeries}

/** Round-6 part six: CUSUM fold, Poisson-bootstrap CI, l-diversity. */
class Round6eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---------------------------------------------------------------- cusum

  private def ev(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "d", "value")
      .select(col("event_type"), to_timestamp(col("d")).as("ts"), col("value"))
  }

  test("cusumReport: flat series never rises; peak stays NULL") {
    val r = TimeSeries.cusumReport(ev(Seq(
      ("a", "2024-01-01", 5.0), ("a", "2024-01-02", 5.0),
      ("a", "2024-01-03", 5.0))), "event_type").collect().head
    assert(r.getLong(4) == 0L)
    assert(r.isNullAt(5))
  }

  test("cusumReport: hand-computed step change, first-argmax peak day") {
    // daily y (micro): 1e6, 1e6, 4e6, 4e6 → μ = 2.5e6, k = 125000.
    // increments y−μ−k: −1625000, −1625000, +1375000, +1375000
    // S: 0, 0, 1375000, 2750000 → max 2750000 first reached on day 4.
    val r = TimeSeries.cusumReport(ev(Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 1.0),
      ("a", "2024-01-03", 4.0), ("a", "2024-01-04", 4.0))),
      "event_type").collect().head
    assert(r.getLong(2) == 2500000L)       // mu_floor
    assert(r.getLong(3) == 125000L)        // slack at 50‰
    assert(r.getLong(4) == 2750000L)       // cusum_max
    assert(r.getDate(5).toString == "2024-01-04")
  }

  test("cusumReport: input row order cannot perturb the fold") {
    val rows = Seq(
      ("a", "2024-01-03", 9.0), ("a", "2024-01-01", 2.0),
      ("a", "2024-01-02", 7.0), ("a", "2024-01-04", 1.0))
    val r1 = TimeSeries.cusumReport(ev(rows), "event_type").collect()
    val r2 = TimeSeries.cusumReport(ev(rows.reverse), "event_type").collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  // ------------------------------------------------------------ bootstrap

  test("meanCi: constant-valued group — interval degenerates to the mean") {
    import spark.implicits._
    val df = (1L to 500L).map(i => ("g", i, 3.25)).toDF("g", "id", "v")
    val r = Bootstrap.meanCi(df, "g", "v", "id").collect().head
    assert(r.getLong(3) == 3250000L)               // mean_micro_floor
    assert(r.getLong(4) == 3250000L)               // ci_lo
    assert(r.getLong(5) == 3250000L)               // ci_hi
    assert(r.getInt(6) == 0)                       // no dead replicates
  }

  test("meanCi: deterministic across runs and partitionings; lo ≤ hi") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (s"g${i % 2}", i, (i % 13).toDouble))
      .toDF("g", "id", "v")
    val a = Bootstrap.meanCi(df, "g", "v", "id").collect()
    val b = Bootstrap.meanCi(df.repartition(13), "g", "v", "id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall(r => r.getLong(4) <= r.getLong(5)))
    assert(a.forall(r => r.getLong(4) <= r.getLong(3) + 200000 &&
      r.getLong(3) <= r.getLong(5) + 200000)) // interval brackets the mean
  }

  test("replicateWeight: Poisson(1)-ish mass — mean weight near 1") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("id")
    val total = ids.select(
      Bootstrap.replicateWeight(col("id"), 0, 24).as("w"))
      .agg(sum("w")).collect().head.getLong(0)
    assert(total > 1800 && total < 2200) // E[Σw] = 2000, sd ≈ 45
  }

  // ---------------------------------------------------------- l-diversity

  test("lDiversityReport: homogeneous class flagged; diverse class passes") {
    import spark.implicits._
    val df = Seq(
      ("q1", "s1"), ("q1", "s1"), ("q1", "s1"),        // pure class
      ("q2", "s1"), ("q2", "s2"), ("q2", "s3"), ("q2", "s2"))
      .toDF("q", "sv")
    val r = Privacy.lDiversityReport(df, Seq("q"), "sv", 3L).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4),
          x.getBoolean(5))).toMap
    assert(r("q1") == (3L, 1L, 3L, true, true))
    assert(r("q2") == (4L, 3L, 2L, false, false))
  }
}
