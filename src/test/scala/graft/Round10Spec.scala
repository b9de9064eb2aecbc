package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Deciles, Evaluation, SpanDedup}

/** Round-10 part one specs: the round-9 advice-item edge cases — the
  * splitConformal 1-row contract on degenerate splits, join-tier ≡
  * scan-tier decontamination agreement on an empty reference, clamped
  * boundary-fidelity windows at n > 100, the sign-split q267 yhat, and
  * the collect-cap range guard.
  */
class Round10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def conformal(rows: Seq[(Boolean, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("cal", "s")
      .select(col("cal"), col("s").as("y"), lit(0L).as("yhat"))
    val out = Evaluation
      .splitConformal(df, col("cal"), col("y"), col("yhat")).collect()
    graft.util.Caches.releaseAll()
    out
  }

  test("splitConformal: empty calibration still emits the 1-row report " +
    "(n_cal = 0, NULL qhat/coverage)") {
    val r = conformal(Seq((false, 3L), (false, 5L)))
    assert(r.length === 1, r.mkString(";"))
    val h = r.head
    assert(h.getLong(0) === 0L && h.getLong(1) === 2L, h.toString)
    assert(h.isNullAt(2) && h.isNullAt(3) && h.isNullAt(4), h.toString)
    assert(h.getLong(5) === 900000L)
  }

  test("splitConformal: empty eval still emits the 1-row report " +
    "(n_eval = 0, NULL coverage, finite qhat kept)") {
    // n_cal = 19, alpha = 0.1 → k = ceil(20·0.9) = 18 → qhat = 18
    val r = conformal((1L to 19L).map(s => (true, s)))
    assert(r.length === 1, r.mkString(";"))
    val h = r.head
    assert(h.getLong(0) === 19L && h.getLong(1) === 0L, h.toString)
    assert(h.getLong(2) === 18L, h.toString)
    assert(h.isNullAt(3) && h.isNullAt(4), h.toString)
  }

  test("splitConformal: fully empty input is still one all-degenerate " +
    "row, never an empty relation") {
    val r = conformal(Seq.empty)
    assert(r.length === 1, r.mkString(";"))
    val h = r.head
    assert(h.getLong(0) === 0L && h.getLong(1) === 0L, h.toString)
    assert(h.isNullAt(2) && h.isNullAt(3) && h.isNullAt(4), h.toString)
  }

  test("splitConformal: non-degenerate values are unchanged by the " +
    "seeded-row form") {
    // the Round9fSpec textbook case re-run through the new plan shape
    val r = conformal((1L to 9L).map(s => (true, s)) ++
      Seq(5L, 9L, 10L).map(s => (false, s)))
    val h = r.head
    assert(h.getLong(0) === 9L && h.getLong(1) === 3L, h.toString)
    assert(h.getLong(2) === 9L && h.getLong(3) === 2L, h.toString)
    assert(h.getLong(4) === 2000000L / 3L, h.toString)
  }

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontReportScan: an all-short reference (zero window hashes) " +
    "agrees with the join tier — clean zero-contamination report") {
    val reference = corpus((100L, "a b")) // shorter than l=5: no windows
    val c = corpus((1L, "x a b c d e y"), (2L, "p q r"))
      .withColumn("source", lit("s"))
    val scan = SpanDedup.decontReportScan(c, reference, "source", 5)
      .collect()
    val join = SpanDedup.decontReport(c, reference, "source", 5)
      .collect()
    assert(scan.toSeq.map(_.toString) === join.toSeq.map(_.toString))
    assert(scan.length === 1)
    val g = scan.head
    // 2 docs, 0 contaminated, 10 tokens, 0 contaminated, 0 ppm
    assert(g.getLong(1) === 2L && g.getLong(2) === 0L &&
      g.getLong(3) === 10L && g.getLong(4) === 0L &&
      g.getLong(5) === 0L, g.toString)
  }

  test("boundaryFidelity: n > 100 clamps the ±1%-quantile window to " +
    "[0,1] instead of going silently NULL") {
    import spark.implicits._
    val df = (1 to 50).map(v => ("g", v.toLong, v.toLong))
      .toDF("source", "doc_id", "n_tokens")
    val rows = Deciles
      .boundaryFidelity(df, "source", "n_tokens", n = 200).collect()
    assert(rows.length === 199)
    rows.foreach { r =>
      assert(!r.isNullAt(4), s"NULL within_bound at $r")
      assert(r.getBoolean(4), r.toString)
    }
  }

  test("q267 yhat: sign-split floor division truncates toward zero on " +
    "negative sums — the structure both engines agree on") {
    import spark.implicits._
    val df = Seq(("a", -7L), ("a", 0L), ("b", 7L), ("b", 0L))
      .toDF("g", "vm")
    val y = df.groupBy("g")
      .agg(expr("(case when sum(vm) < 0 then -1 else 1 end) * " +
        "(abs(cast(sum(vm) as decimal(38,0))) div count(1))")
        .as("yhat"))
      .collect().map(r => r.getString(0) ->
        r.getAs[Number]("yhat").longValue).toMap
    // -7/2: sign-split gives -1·(7 div 2) = -3 in BOTH engines; a bare
    // floor division would give -4 in DuckDB and -3 in Spark
    assert(y === Map("a" -> -3L, "b" -> 3L), y.toString)
  }

  test("countedCollect: cap at/above Int.MaxValue or non-positive is " +
    "rejected loudly, not wrapped") {
    val df = spark.range(1).toDF("x")
    val e = intercept[IllegalArgumentException] {
      graft.util.Guards.countedCollect(df, "wrapOp",
        cap = Int.MaxValue.toLong)
    }
    assert(e.getMessage.contains("wrapOp"), e.getMessage)
    intercept[IllegalArgumentException] {
      graft.util.Guards.countedCollect(df, "wrapOp", cap = 0L)
    }
  }
}
