package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** Round-8 part thirteen specs: raking, weight ESS. */
class Round8mSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    // rows A:B split 40:10; cols x:y split 40:10; A is 80% of mass
    (Seq.fill(30)(("A", "x")) ++ Seq.fill(10)(("A", "y")) ++
      Seq.fill(10)(("B", "x"))).toDF("lang", "source")
  }

  test("rakeWeights: row shares equalize, column masses are kept") {
    val out = Mixture.rakeWeights(corpus, "lang", "source", 2)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // raked row share moves from 800000/200000 ppm toward 500000
    val shares = out.map(t => t._1._1 -> t._4).toMap
    assert(shares("A") > 400000L && shares("A") < 600000L,
      out.mkString(","))
    assert(shares("B") > 400000L && shares("B") < 600000L)
    // the LAST step scales to column targets: col mass == target up
    // to one floor unit per cell
    val colMass = out.groupBy(_._1._2)
      .map { case (c, rows) => c -> rows.map(_._3).sum }
    assert(math.abs(colMass("x") - 40000000L) <= 2, colMass.toString)
    assert(math.abs(colMass("y") - 10000000L) <= 2, colMass.toString)
    assert(out.forall(_._3 > 0))
    graft.util.Caches.releaseAll()
  }

  test("weightEss: uniform weights give ESS = N exactly, skew less") {
    import spark.implicits._
    val uniform = Seq((10L, 10000000L), (20L, 20000000L),
      (30L, 30000000L)).toDF("n", "weight_micro")
    val r = Mixture.weightEss(uniform, "n", "weight_micro")
      .collect()(0)
    assert(r.getLong(0) === 60L && r.getDouble(3) === 60.0,
      r.toString)
    assert(r.getLong(4) === 1000000L)
    // all mass on one small cell -> far fewer effective rows
    val skew = Seq((10L, 59000000L), (50L, 1000000L))
      .toDF("n", "weight_micro")
    val s = Mixture.weightEss(skew, "n", "weight_micro").collect()(0)
    assert(s.getDouble(3) < 11.0, s.toString)
    graft.util.Caches.releaseAll()
  }

  test("rakeWeights: raked corpus ESS stays a sane fraction of N") {
    val ess = Mixture.weightEss(
      Mixture.rakeWeights(corpus, "lang", "source", 2),
      "n", "weight_micro").collect()(0)
    assert(ess.getLong(0) === 50L)
    assert(ess.getDouble(3) > 25.0 && ess.getDouble(3) <= 50.0,
      ess.toString)
    graft.util.Caches.releaseAll()
  }
}
