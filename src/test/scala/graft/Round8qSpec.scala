package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Preference

/** Round-8 part seventeen specs: Cronbach's α. */
class Round8qSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def alpha(rows: Seq[(Long, String, Double)],
      items: Seq[String]) = {
    import spark.implicits._
    Preference.cronbachAlpha(rows.toDF("u", "it", "v"), "u", "it",
      "v", items).collect()(0)
  }

  test("cronbachAlpha: perfectly parallel items read exactly 1") {
    val rows = (1 to 10).flatMap(u =>
      Seq((u.toLong, "a", u * 2.0), (u.toLong, "b", u * 2.0)))
    val r = alpha(rows, Seq("a", "b"))
    assert(r.getLong(0) === 10L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0, r.toString)
    graft.util.Caches.releaseAll()
  }

  test("cronbachAlpha: opposed items zero the total -> NULL; " +
    "incomplete units are excluded") {
    // x and -x: total is constant, v_tot = 0
    val opp = (1 to 10).flatMap(u =>
      Seq((u.toLong, "a", u * 1.0), (u.toLong, "b", -u * 1.0)))
    assert(alpha(opp, Seq("a", "b")).isNullAt(2))
    // one unit missing item b drops out and the rest still read 1
    val ragged = (1 to 10).flatMap(u =>
      Seq((u.toLong, "a", u * 2.0), (u.toLong, "b", u * 2.0))) ++
      Seq((99L, "a", 7.0))
    val r = alpha(ragged, Seq("a", "b"))
    assert(r.getLong(0) === 10L && r.getDouble(2) === 1.0, r.toString)
    graft.util.Caches.releaseAll()
  }

  test("cronbachAlpha: unrelated items score low") {
    val rows = (1 to 24).flatMap(u =>
      Seq((u.toLong, "a", (u % 4) * 1.0),
        (u.toLong, "b", ((u * 7) % 5) * 1.0)))
    val r = alpha(rows, Seq("a", "b"))
    assert(r.getDouble(2) < 0.5, r.toString)
    graft.util.Caches.releaseAll()
  }
}
