package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TimeSeries}

/** Round-6 part eight: autocorrelation, Mann–Kendall, random projection,
  * rolling P95.
  */
class Round6gSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ev(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "d", "value")
      .select(col("event_type"), to_timestamp(col("d")).as("ts"), col("value"))
  }

  // ------------------------------------------------------------- autocorr

  test("autocorrReport: hand-computed linear series → ACF₁ = 0.25") {
    // daily milli y = 0,1000,2000,3000; centered terms/n² give
    // den = 5·10⁶, num = 1.25·10⁶ → 0.25
    val r = TimeSeries.autocorrReport(ev(Seq(
      ("a", "2024-01-01", 0.0), ("a", "2024-01-02", 1.0),
      ("a", "2024-01-03", 2.0), ("a", "2024-01-04", 3.0))),
      "event_type").collect().head
    assert(r.getLong(2) == 3L)             // n_pairs
    assert(r.getLong(3) == 1250000L)       // num_milli2
    assert(r.getLong(4) == 5000000L)       // den_milli2
    assert(r.getDouble(5) == 0.25)
    graft.util.Caches.releaseAll()
  }

  test("autocorrReport: constant series has zero variance → NULL ACF") {
    val r = TimeSeries.autocorrReport(ev(Seq(
      ("a", "2024-01-01", 2.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 2.0))), "event_type").collect().head
    assert(r.getLong(4) == 0L)
    assert(r.isNullAt(5))
    graft.util.Caches.releaseAll()
  }

  test("autocorrReport: calendar gaps break lag pairs") {
    val r = TimeSeries.autocorrReport(ev(Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-05", 3.0))), "event_type").collect().head
    assert(r.getLong(2) == 1L) // only (01→02); the 02→05 gap is no pair
    graft.util.Caches.releaseAll()
  }

  // ---------------------------------------------------------- mann-kendall

  test("mannKendall: strictly increasing series, continuity-corrected z") {
    val r = TimeSeries.mannKendall(ev(Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 3.0), ("a", "2024-01-04", 4.0))),
      "event_type").collect().head
    assert(r.getLong(3) == 6L && r.getLong(4) == 6L) // n_pairs, S
    assert(r.getLong(5) == 156L)                     // 4·3·13, no ties
    val z = 5.0 / math.sqrt(156.0 / 18.0)
    assert(math.abs(r.getDouble(6) - z) < 1e-6)
    graft.util.Caches.releaseAll()
  }

  test("mannKendall: ties shrink the variance via the correction term") {
    val r = TimeSeries.mannKendall(ev(Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 1.0),
      ("a", "2024-01-03", 2.0))), "event_type").collect().head
    assert(r.getLong(4) == 2L)     // S: two up-pairs, one tie
    assert(r.getLong(5) == 48L)    // 3·2·11 − 2·1·9
    assert(r.getLong(2) == 2L)     // n_distinct
    graft.util.Caches.releaseAll()
  }

  // ---------------------------------------------------- random projection

  test("randomProjection: basis vector reads the sign matrix back") {
    import spark.implicits._
    val dim = 16
    val onehot = Array.fill(dim)(0.0f)
    onehot(3) = 1.0f // dim index 3 (0-based)
    val df = Seq((7L, onehot.toSeq)).toDF("vec_id", "embedding")
    val r = Similarity.randomProjection(df, 4, dim).collect()
      .map(x => x.getInt(1) -> x.getLong(2)).toMap
    val p = graft.operators.Sampling.HashMod
    (0 until 4).foreach { j =>
      val h = (((3L * 4 + j) % p) * 2654435761L) % p
      val want = if (h < Similarity.RpSignThreshold) 1000000L else -1000000L
      assert(r(j + 1) == want)
    }
  }

  test("randomProjection: deterministic and partitioning-invariant") {
    val emb = Tables.load(spark, sf, "embeddings")
    val a = Similarity.randomProjection(emb, 4, 64).collect()
    val b = Similarity.randomProjection(emb.repartition(11), 4, 64)
      .orderBy("vec_id", "j").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  // ----------------------------------------------------------- rolling p95

  test("rollingP95: exact order statistic accumulates across the window") {
    val d1 = (1 to 20).map(i => ("x", "2024-01-01", i.toDouble))
    val d2 = (1 to 20).map(i => ("x", "2024-01-02", i.toDouble))
    val r = TimeSeries.rollingP95(ev(d1 ++ d2)).collect()
      .map(x => x.getDate(0).toString -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r("2024-01-01") == (20L, 19L, 19000000L))
    assert(r("2024-01-02") == (40L, 38L, 19000000L))
    graft.util.Caches.releaseAll()
  }

  test("rollingP95: days beyond the trailing window fall out") {
    val r = TimeSeries.rollingP95(ev(Seq(
      ("x", "2024-01-01", 100.0), ("x", "2024-01-10", 1.0)))
    ).collect().map(x => x.getDate(0).toString -> x.getLong(3)).toMap
    assert(r("2024-01-01") == 100000000L)
    assert(r("2024-01-10") == 1000000L) // the 100 from day 1 aged out
    graft.util.Caches.releaseAll()
  }
}
