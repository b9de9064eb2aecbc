package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, Evaluation, Graph, Transitions}

/** Round-8 part three/four specs: winnowing, Kneser–Ney, LPA, Brier
  * decomposition, removal-effect attribution.
  */
class Round8cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("winnowingReport: shared run guarantees a shared fingerprint") {
    import spark.implicits._
    // docs 1/2 share an 8-token run (>= windowSize+k-1 = 6 tokens), doc
    // 3 is disjoint — the winnowing coverage theorem forces 1 and 2 to
    // share a fingerprint; 3 must share nothing
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two $shared three"),
      (2L, s"$shared four five six"),
      (3L, "completely different words here nothing matches at all"))
      .toDF("doc_id", "text")
    val r = Dedup.winnowingReport(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r(1L)._2 > 0, s"doc 1 must share a fingerprint: $r")
    assert(r(2L)._2 > 0, s"doc 2 must share a fingerprint: $r")
    assert(r(3L)._2 == 0, s"doc 3 shares nothing: $r")
    // density: fingerprints are a strict subset of the grams
    assert(r(1L)._1 > 0 && r(1L)._1 < 9)
    graft.util.Caches.releaseAll()
  }

  test("winnowingReport: short docs form one whole-doc window") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val r = Dedup.winnowingReport(docs, k = 3, windowSize = 4).collect()
    // doc 1 has exactly one 3-gram -> one fingerprint; doc 2 has no
    // 3-gram and drops out
    assert(r.map(_.getLong(0)).toSeq == Seq(1L))
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 1L)
    graft.util.Caches.releaseAll()
  }

  test("bigramKnNll: repeated fluent text scores below shuffled text") {
    import spark.implicits._
    val fluent = Seq.fill(20)("the quick brown fox jumps over the lazy dog")
      .mkString(" ")
    // every transition unique: no bigram repeats, so each backs off to
    // its continuation probability — maximal surprisal
    val salad = (0 until 180).map(i => s"w${(i * 37) % 180}")
      .mkString(" ")
    val docs = (1 to 6).map(i => (i.toLong, if (i <= 3) fluent else salad,
      "src")).toDF("doc_id", "text", "source")
    val r = CorpusStats.bigramKnNll(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(1L) < r(4L),
      s"fluent must score lower NLL than salad: $r")
    graft.util.Caches.releaseAll()
  }

  test("labelPropagation: two cliques joined by a bridge separate") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L)))
      .toDF("node_a", "node_b")
    val r = Graph.labelPropagation(edges, 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // each clique converges to its own min label
    assert(Seq(1L, 2L, 3L).map(r).distinct.size == 1)
    assert(Seq(11L, 12L, 13L).map(r).distinct.size == 1)
    assert(r(1L) != r(11L), s"cliques must separate: $r")
    graft.util.Caches.releaseAll()
  }

  test("brierReport: perfect and constant forecasts decompose sanely") {
    import spark.implicits._
    // perfect forecast: pm = y * 1e6 -> brier 0, reliability 0
    val perfect = (1 to 100).map(i =>
      (if (i % 4 == 0) 1000000L else 0L, i % 4 == 0))
      .toDF("pm", "y")
    val p = Evaluation.brierReport(perfect, "pm", col("y")).collect()(0)
    assert(p.getDouble(3) == 0.0 && p.getDouble(4) == 0.0)
    // resolution equals uncertainty when forecasts perfectly separate
    assert(math.abs(p.getDouble(5) - p.getDouble(6)) < 1e-3,
      s"resolution ~ uncertainty for a perfect forecast: $p")
    // constant base-rate forecast: no resolution, tiny reliability
    val const = (1 to 100).map(i => (250000L, i % 4 == 0)).toDF("pm", "y")
    val c = Evaluation.brierReport(const, "pm", col("y")).collect()(0)
    assert(c.getDouble(5) == 0.0, s"constant forecast has no resolution: $c")
    assert(c.getDouble(4) < 1e-3, s"base-rate forecast is calibrated: $c")
    graft.util.Caches.releaseAll()
  }

  test("removalEffect: the channel on every converting path gets credit") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // users 1..3: view -> click -> purchase; users 4..6: view -> error
    // (no conversion). Removing click must kill ALL conversions;
    // removing error must cost nothing.
    val ev = (1 to 3).flatMap(u => Seq(
      (u.toLong, ts(s"2024-01-0$u 10:00:00"), 10L * u, "view"),
      (u.toLong, ts(s"2024-01-0$u 10:01:00"), 10L * u + 1, "click"),
      (u.toLong, ts(s"2024-01-0$u 10:02:00"), 10L * u + 2, "purchase"))) ++
      (4 to 6).flatMap(u => Seq(
        (u.toLong, ts(s"2024-01-0$u 10:00:00"), 10L * u, "view"),
        (u.toLong, ts(s"2024-01-0$u 10:01:00"), 10L * u + 1, "error")))
    val df = ev.toDF("user_id", "ts", "event_id", "event_type")
    val r = Transitions.removalEffect(df, "purchase", steps = 6)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    val full = r("click")._1
    assert(full > 0, s"some conversion mass must reach ~conv: $r")
    assert(r("click")._2 == 0 && r("click")._3 == 1000000L,
      s"click is on every converting path: $r")
    assert(r("error")._2 == full && r("error")._3 == 0L,
      s"error is never on a converting path: $r")
    // removal can only reduce conversion probability
    assert(r.values.forall(v => v._2 <= full), s"monotone: $r")
    graft.util.Caches.releaseAll()
  }
}
