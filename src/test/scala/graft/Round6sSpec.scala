package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}

/** Round-6 part twenty: nearest-neighbor label-noise audit + MP3
  * frame-header parsing.
  */
class Round6sSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import Multimodal.AudioCodec

  test("parseMp3: round-trips buildMp3 parameters exactly") {
    for (kbps <- Seq(64, 128, 320); rate <- Seq(44100, 48000, 32000)) {
      val b = AudioCodec.buildMp3(kbps, rate, 4)
      val i = AudioCodec.parseMp3(b).get
      assert(i.bitrateKbps == kbps && i.sampleRate == rate)
      assert(i.nFrames == 4L)
      assert(i.durationMs == 4L * 1152 * 1000 / rate)
    }
  }

  test("parseMp3: junk prefix skipped, truncated final frame uncounted") {
    val clean = AudioCodec.buildMp3(128, 44100, 3)
    val prefixed = Array[Byte](1, 2, 3, 0x49, 0x44, 0x33) ++ clean
    assert(AudioCodec.parseMp3(prefixed).get.nFrames == 3L)
    val truncated = clean.dropRight(10) // cuts into frame 3
    assert(AudioCodec.parseMp3(truncated).get.nFrames == 2L)
    assert(AudioCodec.parseMp3("not audio".getBytes).isEmpty)
    // a WAV is not an MP3 and vice versa
    val wav = AudioCodec.buildWav(1, 8000, new Array[Byte](64))
    assert(AudioCodec.parseMp3(wav).isEmpty)
    assert(AudioCodec.parseWav(clean).isEmpty)
  }

  test("parseMp3: mid-stream invalid header keeps the frames already walked") {
    val clean = AudioCodec.buildMp3(128, 44100, 3)
    // append a sync-aliasing header with a FREE bitrate (index 0):
    // 0xff 0xfb 0x00 — pre-fix this nulled the whole stream
    val corruptTail = clean ++ Array[Byte](0xff.toByte, 0xfb.toByte, 0, 0)
    val i = AudioCodec.parseMp3(corruptTail).get
    assert(i.nFrames == 3L && i.bitrateKbps == 128)
    // reserved sample-rate index (binary 11) mid-walk: same rule
    val badRate = clean ++ Array[Byte](0xff.toByte, 0xfb.toByte,
      ((1 << 4) | (3 << 2)).toByte, 0)
    assert(AudioCodec.parseMp3(badRate).get.nFrames == 3L)
    // but a FIRST synced frame that is invalid still returns None
    val onlyBad = Array[Byte](0xff.toByte, 0xfb.toByte, 0, 0)
    assert(AudioCodec.parseMp3(onlyBad).isEmpty)
  }

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
