package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Concentration, Sampling}

/** Round-6 part thirty-one: HHI and effective sample size. */
class Round7dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hhiReport: monopoly reads 1, balanced mix reads 1/k") {
    import spark.implicits._
    val df = Seq(("m", "en"), ("m", "en"), ("m", "en"),
      ("b", "en"), ("b", "de"), ("b", "fr"), ("b", "zh"))
      .toDF("source", "lang")
    val r = Concentration.hhiReport(df, "source", "lang")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("m").getDouble(4) == 1.0 && r("m").getDouble(5) == 1.0)
    assert(r("b").getDouble(4) == 0.25)   // 4 equal shares → 1/4
    assert(r("b").getDouble(5) == 4.0)    // 4 effective competitors
    assert(r("b").getLong(3) == 4L)       // Σc² = 4·1
  }

  test("essReport: equal weights keep full ESS, one dominant halves it") {
    import spark.implicits._
    val eq = Seq(("e", 2.0), ("e", 2.0), ("e", 2.0), ("e", 2.0))
      .toDF("source", "w")
    val re = Sampling.essReport(eq, "source", "w").collect().head
    assert(re.getDouble(3) == 4.0 && re.getDouble(4) == 1.0)
    // weights 1,1,1,3: ESS = 36/12 = 3
    val sk = Seq(("s", 1.0), ("s", 1.0), ("s", 1.0), ("s", 3.0))
      .toDF("source", "w")
    val rs = Sampling.essReport(sk, "source", "w").collect().head
    assert(rs.getDouble(3) == 3.0 && rs.getDouble(4) == 0.75)
    // all-zero weights → NULL
    val z = Seq(("z", 0.0)).toDF("source", "w")
    assert(Sampling.essReport(z, "source", "w").collect().head.isNullAt(3))
  }
}
