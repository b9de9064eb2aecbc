package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Rfm}

/** Round-6 part thirteen: nDCG/MRR and RFM. */
class Round6lSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ----------------------------------------------------------------- ndcg

  test("ndcgReport: relevant-on-top scores 1, buried scores less, MRR") {
    import spark.implicits._
    val df = Seq(
      // group a: 2 relevant, ranked 1-2 by score → ideal
      ("a", 90L, 1L, true), ("a", 80L, 2L, true), ("a", 70L, 3L, false),
      // group b: 1 relevant at rank 3
      ("b", 90L, 4L, false), ("b", 80L, 5L, false), ("b", 70L, 6L, true))
      .toDF("g", "s", "id", "y")
    val r = Evaluation.ndcgReport(df, "g", "s", "id", col("y"), 10)
      .collect().map(x => x.getString(0) ->
        (x.getLong(2), x.getDouble(5), x.getLong(6))).toMap
    assert(r("a")._1 == 2L && r("a")._2 == 1.0)
    assert(r("a")._3 == 1000000000L)                // first relevant at 1
    val d = Evaluation.discountNano(10)
    val expectB = BigDecimal(d(2).toDouble / d(0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("b")._2 == expectB)
    assert(r("b")._3 == math.round(1e9 / 3))
  }

  test("ndcgReport: no relevant items → NULL ndcg, zero MRR; k truncates") {
    import spark.implicits._
    val df = Seq(("a", 5L, 1L, false), ("a", 4L, 2L, false))
      .toDF("g", "s", "id", "y")
    val r0 = Evaluation.ndcgReport(df, "g", "s", "id", col("y"), 10)
      .collect().head
    assert(r0.isNullAt(5) && r0.getLong(6) == 0L)

    // relevant item at rank 3 falls outside k = 2
    val df2 = Seq(("a", 5L, 1L, false), ("a", 4L, 2L, false),
      ("a", 3L, 3L, true)).toDF("g", "s", "id", "y")
    val r2 = Evaluation.ndcgReport(df2, "g", "s", "id", col("y"), 2)
      .collect().head
    assert(r2.getLong(1) == 2L && r2.getLong(2) == 0L)
  }

  // ------------------------------------------------------------------ rfm

  private def ev(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "d", "value")
      .select(col("user_id"), to_timestamp(col("d")).as("ts"), col("value"))
  }

  test("rfmReport: metrics exact; quintile scores ordered with the metric") {
    // 5 users with strictly increasing frequency/monetary and strictly
    // DECREASING recency → f_q/m_q ascend 1..5 and r_q also ascends
    // (later users are more recent)
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map(i => (u.toLong, f"2024-01-${u * 2}%02d", u.toDouble))
    }
    val r = Rfm.rfmReport(ev(rows)).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3),
          x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    (1 to 5).foreach { u =>
      val (rec, f, m, rq, fq, mq) = r(u.toLong)
      assert(f == u.toLong)
      assert(m == u.toLong * u * 1000000L)
      assert(rec == (10 - u * 2).toLong)
      assert(fq == u.toLong && mq == u.toLong && rq == u.toLong)
    }
    graft.util.Caches.releaseAll()
  }

  test("rfmReport: ties share a score; partitioning-invariant") {
    val rows = Seq((1L, "2024-01-01", 5.0), (2L, "2024-01-01", 5.0),
      (3L, "2024-01-01", 5.0))
    val r = Rfm.rfmReport(ev(rows)).collect()
    assert(r.map(_.getLong(4)).distinct.length == 1)
    assert(r.map(_.getLong(5)).distinct.length == 1)
    val r2 = Rfm.rfmReport(ev(rows).repartition(7)).collect()
    assert(r.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    graft.util.Caches.releaseAll()
  }
}
