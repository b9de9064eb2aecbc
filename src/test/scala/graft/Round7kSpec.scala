package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import Multimodal.{AudioCodec, VideoContainer}

/** Round-7 part six: MP4/ISO-BMFF container parsing. */
class Round7kSpec extends AnyFunSuite {

  test("parseMp4: round-trips buildMp4 parameters exactly") {
    for (ts <- Seq(600, 1000, 90000); secs <- Seq(1L, 5L);
         tracks <- Seq(1, 2); dim <- Seq(320, 336)) {
      val b = VideoContainer.buildMp4(ts, secs * ts, tracks, dim, dim / 2)
      val i = VideoContainer.parseMp4(b).get
      assert(i.timescale == ts && i.durationTicks == secs * ts)
      assert(i.durationMs == secs * 1000L)
      assert(i.nTracks == tracks)
      assert(i.width == dim && i.height == dim / 2)
    }
  }

  test("parseMp4: the ftyp brand gate rejects non-BMFF payloads") {
    assert(VideoContainer.parseMp4("not a video at all".getBytes).isEmpty)
    assert(VideoContainer.parseMp4(Array[Byte]()).isEmpty)
    // a WAV and an MP3 never pass the gate; and an MP4 is neither
    val wav = AudioCodec.buildWav(1, 8000, new Array[Byte](64))
    val mp3 = AudioCodec.buildMp3(128, 44100, 2)
    assert(VideoContainer.parseMp4(wav).isEmpty)
    assert(VideoContainer.parseMp4(mp3).isEmpty)
    val mp4 = VideoContainer.buildMp4(600, 600, 1, 320, 240)
    assert(AudioCodec.parseWav(mp4).isEmpty)
    assert(AudioCodec.parseMp3(mp4).isEmpty)
  }

  test("parseMp4: truncated trailing box keeps the parsed moov") {
    val full = VideoContainer.buildMp4(1000, 3000, 2, 320, 240)
    // mdat is the last 8 bytes; cutting into it must not null the file
    val cut = full.dropRight(4)
    val i = VideoContainer.parseMp4(cut).get
    assert(i.durationMs == 3000L && i.nTracks == 2)
    // but cutting into moov itself leaves no complete mvhd -> None
    val headOnly = full.take(30)
    assert(VideoContainer.parseMp4(headOnly).isEmpty)
  }

  test("parseMp4: corrupt-size trailing box after moov keeps metadata") {
    val full = VideoContainer.buildMp4(1000, 5000, 1, 320, 240)
    // a trailing box whose size field is an invalid 3 (< 8): the walk
    // stops AT moov, so garbage after a complete moov can never null
    // already-parsed metadata — the parseMp3 stop-and-keep rule
    val bad = new Array[Byte](12)
    bad(3) = 3; "junk".getBytes.copyToArray(bad, 4)
    val i = VideoContainer.parseMp4(full ++ bad).get
    assert(i.durationMs == 5000L && i.nTracks == 1 && i.width == 320)
    // same for a size-0 (to-end, unsupported scope) trailing box
    val toEnd = new Array[Byte](12)
    "skip".getBytes.copyToArray(toEnd, 4)
    val i2 = VideoContainer.parseMp4(full ++ toEnd).get
    assert(i2.durationMs == 5000L && i2.nTracks == 1)
  }

  test("parseMp4: corrupt box inside moov keeps what parsed before it") {
    val full = VideoContainer.buildMp4(800, 1600, 1, 100, 50)
    // moov at 24 (after the 24-byte ftyp), mvhd at 32 (108 bytes),
    // first trak at 140 — corrupt the trak's size field to 3
    val cut = full.clone()
    cut(140) = 0; cut(141) = 0; cut(142) = 0; cut(143) = 3
    val i = VideoContainer.parseMp4(cut).get
    // mvhd parsed before the corruption survives; the trak does not
    assert(i.timescale == 800 && i.durationTicks == 1600L)
    assert(i.nTracks == 0 && i.width == 0 && i.height == 0)
  }

  test("parseMp4: unknown top-level boxes are skipped, not fatal") {
    val full = VideoContainer.buildMp4(600, 1200, 1, 640, 480)
    // splice a 'free' box between ftyp and moov
    val free = new Array[Byte](16)
    free(3) = 16; "free".getBytes.copyToArray(free, 4)
    val spliced = full.take(24) ++ free ++ full.drop(24)
    val i = VideoContainer.parseMp4(spliced).get
    assert(i.durationMs == 2000L && i.width == 640 && i.height == 480)
  }
}
