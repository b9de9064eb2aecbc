package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, QualityModel}

/** Round-6 part eighteen: readability, bigram NLL, vocab coverage. */
class Round6qSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("readability: hand-computed Flesch; unpunctuated floors at 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "The cat sat. The dog ran!"),
      (2L, "s", "aaa bbb"),
      (3L, "s", ""))
      .toDF("doc_id", "source", "text")
    val r = QualityModel.readability(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // 6 words / 2 sentences / 6 vowel runs:
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    assert(r(1L).getLong(2) == 6L && r(1L).getLong(3) == 2L &&
      r(1L).getLong(4) == 6L)
    assert(r(1L).getDouble(5) == 119.19)
    assert(r(2L).getLong(3) == 1L)     // sentence floor
    assert(r(3L).isNullAt(5))          // empty doc → NULL score
  }

  test("bigramNll: hand-computed interpolated cells") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "a b a b"),
      (2L, "s", "a a"),
      (3L, "s", "solo"))
      .toDF("doc_id", "source", "text")
    val r = CorpusStats.bigramNll(docs, 75).collect()
      .map(x => x.getLong(0) -> x).toMap
    // census over 4 instances: f(a,b)=2 f(b,a)=1 f(a,a)=1;
    // f_p: a=3 b=1; f_w: b=2 a=2; N=4
    def cell(fpw: Long, fp: Long, fw: Long): Long =
      math.rint(-math.log(0.75 * (fpw.toDouble / fp) +
        0.25 * (fw.toDouble / 4)) * 1e9).toLong
    val d1 = 2 * cell(2, 3, 2) + cell(1, 1, 2)
    assert(r(1L).getLong(2) == 3L)
    assert(r(1L).getLong(3) == d1 / 3)
    assert(r(2L).getLong(2) == 1L && r(2L).getLong(3) == cell(1, 3, 2))
    assert(r(3L).getLong(2) == 0L && r(3L).isNullAt(3)) // < 2 tokens
    graft.util.Caches.releaseAll()
  }

  test("vocabCoverage: curve binds at each budget, clamp above vocab") {
    import spark.implicits._
    val docs = Seq("a a a b b c").toDF("text")
    val r = CorpusStats.vocabCoverageCurve(docs, Seq(1, 2, 5)).collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(1, 2, 5))
    assert(r.map(_.getLong(2)).toSeq == Seq(3L, 5L, 6L))    // covered
    assert(r.map(_.getLong(4)).toSeq ==
      Seq(500000L, 833333L, 1000000L))                       // ppm
    assert(r.forall(_.getLong(1) == 3L))                     // n_vocab_total
    graft.util.Caches.releaseAll()
  }
}
