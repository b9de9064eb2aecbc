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
}
