package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum
import graft.util.Guards

/** Round-12 part one: the PrefixSum two-level scan and the in-plan
  * census-cardinality guard.
  *
  * 1. `PrefixSum.cumBefore` must be BIT-IDENTICAL to the unpartitioned
  *    window `sum(cnt) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING TO
  *    -1)` it replaces (Spearman/Dunn ranks, conformal/RFM
  *    order-statistic picks, ntileExact offsets) — across ties,
  *    negatives, single-bucket degeneracy, and empty input — while
  *    planning ZERO unpartitioned windows.
  * 2. `Guards.boundedCensus` must be a row-identical no-op under the
  *    ceiling and a LOUD runtime failure over it (the deliberately
  *    overflowing census the round-11 verdict asked for).
  */
class Round12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(pairs: Seq[(Long, Long)], buckets: Int = 0): Unit = {
    import spark.implicits._
    val census = pairs.toDF("v", "c").repartition(3)
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = census
      .withColumn("cb", coalesce(sum("c").over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = PrefixSum
      .cumBefore(census, "v", "c", "cb", "Round12Spec", buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected, s"pairs=$pairs buckets=$buckets")
    graft.util.Caches.releaseAll()
  }

  test("cumBefore == unpartitioned exclusive cumsum: scattered values") {
    check(Seq(5L -> 2L, 3L -> 1L, 9L -> 4L, 1L -> 3L, 7L -> 1L))
  }

  test("cumBefore: negative values and a single bucket") {
    check(Seq(-10L -> 5L, 0L -> 1L, -3L -> 2L, 42L -> 7L))
    check(Seq(-10L -> 5L, 0L -> 1L, -3L -> 2L, 42L -> 7L), buckets = 1)
  }

  test("cumBefore: dense consecutive domain, many buckets") {
    check((0L until 40L).map(v => v -> (v % 5 + 1)), buckets = 16)
  }

  test("cumBefore: single value and empty census") {
    check(Seq(7L -> 9L))
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("v", "c")
    assert(PrefixSum.cumBefore(empty, "v", "c", "cb").count() === 0L)
    graft.util.Caches.releaseAll()
  }

  test("cumBefore plans zero unpartitioned windows") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val census = (0L until 100L).map(v => v -> 1L).toDF("v", "c")
    val plan = PrefixSum.cumBefore(census, "v", "c", "cb", "Round12Spec")
      .queryExecution.optimizedPlan
    val bad = plan.collectWithSubqueries {
      case lw: LWindow if lw.partitionSpec.isEmpty => lw
    }
    assert(bad.isEmpty, s"unpartitioned windows in cumBefore plan: $bad")
    graft.util.Caches.releaseAll()
  }

  test("boundedCensus under the cap: row-identical pass-through") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    val out = Guards.boundedCensus(df, "Round12Spec", cap = 3L)
    assert(out.columns.toSeq === Seq("k", "s"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("boundedCensus over the cap: loud in-plan failure naming the op") {
    import spark.implicits._
    val df = (0L until 50L).map(v => (v, v % 3)).toDF("k", "g")
    val e = intercept[Exception] {
      Guards.boundedCensus(df, "Round12Spec.overflow", cap = 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString(" | ")
    assert(all.contains("Round12Spec.overflow") &&
      all.contains("cardinality"),
      s"guard failure lost its message: $all")
  }

  test("boundedCensus guard survives downstream windows and joins " +
    "(the call-site shape)") {
    import spark.implicits._
    val census = (0L until 30L).map(v => (v, 1L)).toDF("v", "c")
    val guarded = Guards.boundedCensus(census, "Round12Spec.site", 5L)
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val e = intercept[Exception] {
      guarded.withColumn("cum", sum("c").over(w))
        .agg(max("cum")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).mkString(" | ").contains("Round12Spec.site"))
  }
}
