package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Correlate

/** Round-8 part fourteen specs: Jonckheere–Terpstra. */
class Round8nSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("jonckheereTerpstra: hand-computed two-group case") {
    import spark.implicits._
    // groups 1:{1,2}, 2:{3,4}: all 4 cross pairs ordered -> JT = 4
    // (its maximum), JT2 = 8; E2 = Σ_{i<j} n_i·n_j = 4; no ties, so
    // Var = [4·3·13 − 2·(2·1·9)]/72 = 120/72 = 5/3 and
    // z = (8−4)/(2·√(5/3)) = 1.549193
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0), (2L, 4.0))
      .toDF("t", "v")
    val r = Correlate.jonckheereTerpstra(df, "t", "v").collect()(0)
    assert(r.getLong(2) === 8L, r.toString)
    assert(r.getLong(3) === 4L, r.toString)
    assert(r.getDouble(4) === 1.549193, r.toString)
    graft.util.Caches.releaseAll()
  }

  test("jonckheereTerpstra: monotone trend positive, reversed negative") {
    import spark.implicits._
    val up = (1 to 4).flatMap(t =>
      (1 to 15).map(i => (t.toLong, t * 10.0 + (i % 3))))
    val zUp = Correlate.jonckheereTerpstra(up.toDF("t", "v"), "t",
      "v").collect()(0)
    assert(zUp.getDouble(4) > 5.0, zUp.toString)
    val down = up.map { case (t, v) => (t, -v) }
    val zDn = Correlate.jonckheereTerpstra(down.toDF("t", "v"), "t",
      "v").collect()(0)
    assert(zDn.getDouble(4) < -5.0, zDn.toString)
    // exchangeable groups sit near zero
    val flat = (1 to 4).flatMap(t =>
      (1 to 15).map(i => (t.toLong, (i % 5).toDouble)))
    val z0 = Correlate.jonckheereTerpstra(flat.toDF("t", "v"), "t",
      "v").collect()(0)
    assert(math.abs(z0.getDouble(4)) < 0.5, z0.toString)
    graft.util.Caches.releaseAll()
  }
}
