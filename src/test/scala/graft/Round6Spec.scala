package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup}

/** Round-6 stop-shingle cap semantics: the caps only remove intersection
  * evidence, so capped survivors are a SUBSET of the uncapped exact tier
  * with pointwise-smaller overlap counts — and the test caps are tight
  * enough to BIND at the fixture SF (assertions would pass vacuously on
  * a cap that drops nothing).
  */
class Round6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")

  test("containmentPairs: capped survivors ⊆ uncapped, inter pointwise ≤") {
    val tau = Round5eQueries.ContainmentTau
    val un = Dedup.containmentPairs(docs, "lang", tau)
      .select("doc_a", "doc_b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cap=6 binds at sf0.001 (3 of 18 pairs survive) without emptying
    // the result — both halves of the subset law stay non-vacuous
    val cp = Dedup.containmentPairs(docs, "lang", tau,
      maxShingleDocs = Some(6L))
      .select("doc_a", "doc_b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cp.nonEmpty, "capped result empty — cap too tight to test subset law")
    assert(cp.size < un.size, "cap did not bind (no pairs dropped)")
    cp.foreach { case (k, interC) =>
      assert(un.contains(k), s"capped pair $k absent from uncapped result")
      assert(interC <= un(k), s"capped inter > uncapped for $k")
    }
  }

  test("sourceOverlap: capped n_common pointwise ≤, sizes exact, binds") {
    val un = CorpusStats.sourceOverlap(docs)
      .select("source_a", "source_b", "n_a", "n_b", "n_common").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cp = CorpusStats.sourceOverlap(docs, maxShingleSources = Some(2L))
      .select("source_a", "source_b", "n_a", "n_b", "n_common").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // full matrix on both sides: same pair set regardless of the cap
    assert(cp.keySet == un.keySet, "capped matrix lost scaffold pairs")
    var dropped = 0L
    cp.foreach { case (k, (na, nb, common)) =>
      val (una, unb, uncommon) = un(k)
      assert(na == una && nb == unb, s"cap changed exact sizes for $k")
      assert(common <= uncommon, s"capped n_common > uncapped for $k")
      dropped += uncommon - common
    }
    assert(dropped > 0, "cap did not bind (no common shingles dropped)")
  }

  test("AudioCodec: build → parse round-trips every parameter") {
    import graft.operators.Multimodal.AudioCodec
    val data = Array.tabulate(1001)(i => (i % 251).toByte)
    for (ch <- Seq(1, 2); rate <- Seq(8000, 44100)) {
      val wav = AudioCodec.buildWav(ch, rate, data)
      val info = AudioCodec.parseWav(wav).get
      val frames = data.length / (ch * 2)
      assert(info == AudioCodec.WavInfo(ch, rate, 16, frames,
        frames * 1000L / rate))
    }
  }

  test("AudioCodec: chunk walk skips LIST chunks; truncation clamps frames") {
    import graft.operators.Multimodal.AudioCodec
    val wav = AudioCodec.buildWav(1, 8000, Array.fill(100)(7.toByte))
    // splice a LIST chunk between fmt and data (RIFF allows any order)
    val listChunk = "LIST".getBytes ++
      Array[Byte](6, 0, 0, 0) ++ "INFOxy".getBytes
    val spliced = wav.take(36) ++ listChunk ++ wav.drop(36)
    // patch the RIFF size (not strictly needed by the parser, but honest)
    val info = AudioCodec.parseWav(spliced).get
    assert(info.nFrames == 50 && info.sampleRate == 8000)
    // truncated data section: header promises 100 bytes, file holds 20
    val truncated = wav.take(44 + 20)
    assert(AudioCodec.parseWav(truncated).get.nFrames == 10)
    // malformed: not RIFF at all
    assert(AudioCodec.parseWav("not a wav file".getBytes).isEmpty)
    assert(AudioCodec.parseWav(Array.empty[Byte]).isEmpty)
  }

  test("q97a/q76a: hot-set guard joins broadcast (plan gate)") {
    for (q <- Seq("q97a_containment_capped", "q76a_source_overlap_capped")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
        s"$q: stop-shingle anti-join not broadcast:\n$p")
    }
  }

  test("MisraGries: exact when capacity ≥ distinct; MG bounds when it binds") {
    import graft.functions.MisraGries.misraGries
    import graft.operators.TextOps
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
    val truth = toks.groupBy("w").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    def summary(cap: Int): Seq[(String, Long)] =
      toks.agg(misraGries(col("w"), cap).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.count_lower")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // capacity ≥ distinct (31 in the fixture): EXACT — sorted equality
    val exact = summary(64)
    assert(exact.toMap == truth, "non-binding capacity must be exact")
    assert(exact == exact.sortBy { case (w, c) => (-c, w) }, "output unsorted")
    // capacity 8 < 31: classic Misra-Gries bounds
    val cap = 8
    val mg = summary(cap).toMap
    assert(mg.size <= cap)
    val eps = n.toDouble / (cap + 1)
    mg.foreach { case (w, c) =>
      assert(c <= truth(w), s"count_lower above truth for $w")
      assert(truth(w) - c <= eps, s"error above n/(cap+1) for $w")
    }
    truth.foreach { case (w, c) =>
      if (c > eps) assert(mg.contains(w), s"heavy item $w missing (n=$c > $eps)")
    }
  }

  test("keepRepresentative: rep is the max-score member; sizes partition clusters") {
    import graft.operators.Dedup
    val pairs = Dedup.minhashNearDups(docs)
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reps = Dedup.keepRepresentative(docs, pairs, "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(reps.nonEmpty)
    val members = cc.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(reps.map(_._1).toSet == members.keySet, "one rep per cluster")
    reps.foreach { case (cl, rep, sz, score) =>
      val m = members(cl)
      assert(m.contains(rep) && sz == m.size && score == chars(rep))
      val best = m.map(id => (-chars(id), id)).min._2
      assert(rep == best, s"cluster $cl rep $rep != max-score member $best")
    }
    graft.util.Caches.releaseAll()
  }

  test("changeIntervals: runs, ties, open-run null, n_obs arithmetic") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "a", ts("2024-01-01 11:00:00")),
      (1L, "b", ts("2024-01-01 12:00:00")),
      (1L, "a", ts("2024-01-01 13:00:00")),
      // key 2: duplicate timestamp with two states — (ts, state) order
      (2L, "y", ts("2024-01-01 10:00:00")),
      (2L, "x", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = graft.operators.TimeSeries
      .changeIntervals(df, "user_id", "event_type", "ts")
      .orderBy("key", "valid_from", "state").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 12:00:00")), 2L),
      (1L, "b", ts("2024-01-01 12:00:00"), Some(ts("2024-01-01 13:00:00")), 1L),
      (1L, "a", ts("2024-01-01 13:00:00"), None, 1L),
      (2L, "x", ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:00:00")), 1L),
      (2L, "y", ts("2024-01-01 10:00:00"), None, 1L)))
  }

  test("q121: one exchange, one sort (window-arithmetic run aggregation)") {
    val p = SparkEntry.queries("q121_change_intervals")(spark, sf)
      .queryExecution.executedPlan.toString
    // the final orderBy adds a rangepartitioning exchange + sort; the
    // operator itself must contribute exactly ONE hash exchange and ONE
    // key sort
    assert("Exchange hashpartitioning\\(key".r.findAllIn(p).size == 1,
      s"expected exactly 1 key shuffle:\n$p")
    val belowOrder = p.split("rangepartitioning").last
    assert("\\bSort \\[key".r.findAllIn(belowOrder).size == 1,
      s"expected exactly 1 key sort under the windows:\n$p")
  }

  test("kmeansReport: census partitions the corpus; inertia falls across rounds") {
    import graft.operators.Similarity
    val e = Tables.load(spark, sf, "embeddings")
    val r1 = Similarity.kmeansReport(e, Round6Queries.KmInitIds, 1).collect()
    val r2 = Similarity.kmeansReport(e, Round6Queries.KmInitIds, 2).collect()
    val total = e.count()
    for (r <- Seq(r1, r2)) {
      assert(r.map(_.getLong(1)).sum == total, "cells must partition the corpus")
      assert(r.map(_.getLong(0)).toSet.subsetOf(
        Round6Queries.KmInitIds.toSet), "cells keyed by init centroid ids")
    }
    val i1 = r1.map(_.getLong(2)).sum
    val i2 = r2.map(_.getLong(2)).sum
    assert(i2 < i1, s"Lloyd round must not increase inertia: $i1 -> $i2")
  }
}
