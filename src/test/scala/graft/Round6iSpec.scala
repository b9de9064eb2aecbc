package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, Evaluation}

/** Round-6 part ten: passage dedup, PR sweep, Zipf fit. */
class Round6iSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // -------------------------------------------------------- passage dedup

  test("passageDupStats: shared block flagged in both docs, unique not") {
    import spark.implicits._
    val block = (1 to 10).map(i => s"w$i").mkString(" ") // one exact passage
    val df = Seq(
      (1L, block + " " + (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, block + " " + (1 to 10).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 10).map(i => s"c$i").mkString(" ")),
      (4L, "tiny doc")) // shorter than one passage
      .toDF("doc_id", "text")
    val r = Dedup.passageDupStats(df, 10).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r(1L) == (2L, 1L, 5000L))
    assert(r(2L) == (2L, 1L, 5000L))
    assert(r(3L) == (1L, 0L, 0L))
    assert(r(4L) == (1L, 0L, 0L))
    graft.util.Caches.releaseAll()
  }

  test("passageDupStats: within-doc repetition is NOT cross-doc sharing") {
    import spark.implicits._
    val block = (1 to 10).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, block + " " + block)).toDF("doc_id", "text")
    val r = Dedup.passageDupStats(df, 10).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L)
    graft.util.Caches.releaseAll()
  }

  // ------------------------------------------------------------- pr curve

  test("prCurve: hand-computed sweep, precision falls as recall rises") {
    import spark.implicits._
    val df = Seq((3L, true), (3L, true), (2L, true), (2L, false),
      (1L, false), (1L, false)).toDF("s", "y")
    val r = Evaluation.prCurve(df, "s", col("y")).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
      .toMap
    assert(r(3L) == (2L, 0L, 1L, 1000000L, 666666L))
    assert(r(2L) == (3L, 1L, 0L, 750000L, 1000000L))
    assert(r(1L) == (3L, 3L, 0L, 500000L, 1000000L))
  }

  // ----------------------------------------------------------------- zipf

  test("zipfFit: slope matches the closed-form OLS over the same census") {
    val r = CorpusStats.zipfFit(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"), 50)
      .collect().head
    val n = r.getLong(0).toDouble
    val (sx, sy, sxx, sxy) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val expected = (n * sxy / 1e9 - (sx.toDouble / 1e9) * (sy.toDouble / 1e9)) /
      (n * sxx / 1e9 - (sx.toDouble / 1e9) * (sx.toDouble / 1e9))
    assert(r.getDouble(6) == BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(6) < 0) // frequency decays with rank
  }

  test("zipfFit: vocab cut bounds the census") {
    val r = CorpusStats.zipfFit(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"), 10)
      .collect().head
    assert(r.getLong(0) == 10L)
  }
}
