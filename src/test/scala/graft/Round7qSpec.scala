package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-7 part twelve: relational power iteration. */
class Round7qSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("topEigenReport: recovers a planted dominant direction") {
    import spark.implicits._
    // 64-dim vectors whose variance is concentrated on dim 1 (±2.0)
    // with small deterministic structure elsewhere
    val rows = (0 until 200).map { k =>
      val v = Array.tabulate(64) { j =>
        if (j == 0) (if (k % 2 == 0) 2.0f else -2.0f)
        else ((k * 7 + j) % 5 - 2) * 0.01f
      }
      (k.toLong, v.toSeq)
    }
    val embs = rows.toDF("vec_id", "embedding")
    val r = Similarity.topEigenReport(embs).collect()
      .map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.size == 64)
    // the planted direction dominates: dim 1 at full ∞-norm scale,
    // every other component at least 10× smaller
    assert(math.abs(r(1)._1) == 1000000L)
    (2 to 64).foreach { d =>
      assert(math.abs(r(d)._1) < 100000L, s"dim $d leaked ${r(d)._1}")
    }
    // Rayleigh quotient positive (a covariance is PSD up to floor noise)
    assert(r(1)._2 > 0L)
  }

  test("topEigenReport: more rounds do not change a converged direction") {
    import spark.implicits._
    val rows = (0 until 100).map { k =>
      val v = Array.tabulate(64)(j =>
        if (j == 0) k.toFloat / 50f - 1f else 0.001f * ((k + j) % 3))
      (k.toLong, v.toSeq)
    }
    val embs = rows.toDF("vec_id", "embedding")
    val v3 = Similarity.topEigenReport(embs, rounds = 3).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    graft.util.Caches.releaseAll()
    val v6 = Similarity.topEigenReport(embs, rounds = 6).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    val drift = v3.keys.map(d => math.abs(v3(d) - v6(d))).max
    assert(drift < 5000L, s"direction still moving after 3 rounds: $drift")
    graft.util.Caches.releaseAll()
  }
}
