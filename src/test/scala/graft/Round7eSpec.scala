package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Constraints

/** Round-6 part thirty-two: inferred range contracts. */
class Round7eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rangeContractReport: envelope holds, breaks, and unknown key flags") {
    import spark.implicits._
    val ref = Seq(("a", 1.0), ("a", 5.0), ("b", 10.0), ("b", 20.0))
      .toDF("k", "v")
    val cur = Seq(
      ("a", 3.0),             // inside
      ("a", 0.5), ("a", 9.0), // below + above
      ("b", 15.0),            // inside → clean key
      ("z", 7.0))             // unseen key
      .toDF("k", "v")
    val r = Constraints.rangeContractReport(ref, cur, "k", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getBoolean(1))
    assert(a.getLong(2) == 1000000L && a.getLong(3) == 5000000L)
    assert(a.getLong(5) == 1L && a.getLong(6) == 1L)
    assert(a.getLong(7) == 666666L && a.getBoolean(8))
    val b = r("b")
    assert(b.getLong(5) == 0L && b.getLong(6) == 0L && !b.getBoolean(8))
    val z = r("z")
    assert(!z.getBoolean(1) && z.isNullAt(2) && z.getBoolean(8))
    assert(z.getLong(5) == 0L) // NULL bounds never count as violations
  }
}
