package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Evaluation}

/** Round-7 part twenty: Good–Turing + Cohen's κ. */
class Round7zSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("goodTuringReport: singleton accounting drives the missing mass") {
    import spark.implicits._
    // slice 'a': tokens x x y z -> N=4, V=3, singletons {y,z}=2
    // slice 'b': all repeats -> zero missing mass
    val docs = Seq(("a", "x x y z"), ("b", "q q"), ("b", "q q"))
      .toDF("source", "text")
    val r = CorpusStats.goodTuringReport(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) == 4L && a.getLong(2) == 3L && a.getLong(3) == 2L)
    assert(a.getLong(4) == 500000L)  // 2/4 unseen mass
    assert(a.getLong(5) == 666666L)  // 2/3 of vocab are singletons
    val b = r("b")
    assert(b.getLong(3) == 0L && b.getLong(4) == 0L)
  }

  test("cohensKappa: perfect, chance-level, and imbalanced agreement") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(Evaluation.cohensKappa(perfect, "a", "b").collect()
      .head.getDouble(3) == 1.0)
    // marginal-independent 50/50 labels at chance -> kappa = 0
    val chance = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    assert(Evaluation.cohensKappa(chance, "a", "b").collect()
      .head.getDouble(3) == 0.0)
    // both constant -> pe = 1 -> NULL (agreement is vacuous)
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Evaluation.cohensKappa(const, "a", "b").collect()
      .head.isNullAt(3))
    // the classic imbalance point: 90% agreement can be mostly chance
    val imb = (1 to 81).map(_ => ("x", "x")) ++
      (1 to 9).map(_ => ("x", "y")) ++ (1 to 9).map(_ => ("y", "x")) ++
      Seq(("y", "y"))
    val k = Evaluation.cohensKappa(imb.toDF("a", "b"), "a", "b")
      .collect().head
    assert(k.getLong(2) == 820000L)          // 82% raw agreement...
    assert(k.getDouble(3) < 0.1, s"kappa ${k.getDouble(3)}") // ...mostly chance
  }
}
