package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-7 part fifteen: capture–recapture duplicate sizing. */
class Round7tSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("captureRecapture: hand-computed Chapman estimate and recalls") {
    import spark.implicits._
    val a = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val b = Seq((1L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
    val r = Dedup.captureRecapture(a, b).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    // Chapman: (4*3)/2 - 1 = 5
    assert(r.getLong(3) == 5L)
    assert(r.getLong(4) == 600000L && r.getLong(5) == 400000L)
  }

  test("captureRecapture: full overlap collapses to the union size") {
    import spark.implicits._
    val a = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val r = Dedup.captureRecapture(a, a).collect().head
    // (3*3)/3 - 1 = 2: both passes caught everything
    assert(r.getLong(3) == 2L)
    assert(r.getLong(4) == 1000000L && r.getLong(5) == 1000000L)
  }
}
