package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-6 part twenty: nearest-neighbor label-noise audit. */
class Round6sSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("labelAgreement: out-voted anchor flags suspect, clustered doesn't") {
    import spark.implicits._
    // anchor 0 (label 0) sits inside a label-1 cluster → suspect;
    // anchor 10 (label 1) sits inside its own cluster → clean
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.99f, 0.1f), 1),
      (2L, Seq(0.98f, 0.15f), 1),
      (10L, Seq(-1.0f, 0.0f), 1),
      (11L, Seq(-0.99f, 0.05f), 1),
      (12L, Seq(-0.97f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelAgreement(embs, Seq(0L, 10L), 2).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(3) == 0L && r(0L).getBoolean(5))   // out-voted
    assert(r(10L).getLong(3) == 2L && !r(10L).getBoolean(5))
    assert(r(10L).getLong(4) == 1000000L)                    // agree_ppm
  }

  test("labelAgreement: k clamps to available neighbors") {
    import spark.implicits._
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelAgreement(embs, Seq(0L), 5).collect().head
    assert(r.getLong(2) == 1L)          // only one neighbor exists
    assert(r.getLong(3) == 1L && !r.getBoolean(5))
  }
}
