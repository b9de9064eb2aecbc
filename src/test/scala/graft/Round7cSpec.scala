package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, Experiment, ProfileDrift}

/** Round-6 part thirty: MDE sizing and pairwise Welch. */
class Round7cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mdeReport: hand-computed detectable lift shrinks with traffic") {
    import spark.implicits._
    def units(n: Int) = (1 to n).map(i => (i % 2, i % 10 == 0))
      .toDF("arm", "success")
    val small = Experiment.mdeReport(units(100)).collect().head
    val big = Experiment.mdeReport(units(10000)).collect().head
    assert(small.getLong(4) == 100000L)   // baseline 10%
    val z = 2.801585                      // frozen (1.959964 + 0.841621)
    val expSmall = math.rint(z * math.sqrt(0.1 * 0.9 *
      (1.0 / 50 + 1.0 / 50)) * 1e6) / 1e6
    assert(small.getDouble(5) == expSmall)
    assert(big.getDouble(5) < small.getDouble(5) / 5) // ~10× traffic
  }

  test("pairwiseWelch: pair rows match welchTReport on the same split") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0),
      ("c", 10.0), ("c", 10.0)).toDF("g", "value")
    val m = Correlate.pairwiseWelch(df, "g", "value").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(m.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // the (a, b) row must equal the two-sample operator on that pair
    val two = ProfileDrift.welchTReport(
      df.filter(col("g") === "a").withColumn("g", lit("x")),
      df.filter(col("g") === "b").withColumn("g", lit("x")),
      "g", "value").collect().head
    val ab = m(("a", "b"))
    assert(ab.getDouble(6) == two.getDouble(7))  // t: a − b both ways
    assert(ab.getDouble(7) == two.getDouble(8))  // Welch df
    // constant group c: variance 0 → t defined vs a (pooled se > 0)
    assert(!m(("a", "c")).isNullAt(6))
    graft.util.Caches.releaseAll()
  }
}
