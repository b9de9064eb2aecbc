package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 verdict task 2: the bench must consume its own calibration
  * series so a host-contention window can never again publish an
  * unannotated >1.5× phantom mover (the r13 q44/q45/q125 class).
  *
  * The scenario under test is the r13 artifact's literally: a quiet
  * run's cal_min ≈ 0.12 s, a mid-run contention window spiking
  * calibration to 0.74 s, and a query whose both tries (and first
  * retry) sat inside that window.
  */
class Round14BenchAdjSpec extends AnyFunSuite {

  // calibration series shaped like r13's: (pos, sec, ok)
  private val quiet = Seq((0, 0.12, true), (20, 0.13, true),
    (40, 0.12, true), (60, 0.125, true))
  private val spiked = Seq((0, 0.12, true), (20, 0.74, true),
    (40, 0.70, true), (60, 0.125, true))

  test("windowRatio brackets a position with the nearest successful " +
    "calibration samples") {
    assert(Bench.windowRatio(quiet, 30, 0.12) < Bench.ContentionThreshold)
    // position 30 sits between the 0.74 and 0.70 spikes
    assert(Bench.windowRatio(spiked, 30, 0.12) > 5.0)
    // position 50: bracketed by 0.70 (contended) and 0.125 (clean) —
    // max of brackets, so still flagged
    assert(Bench.windowRatio(spiked, 50, 0.12) > Bench.ContentionThreshold)
    // position past the last sample uses the left bracket only
    assert(math.abs(Bench.windowRatio(spiked, 99, 0.12) -
      0.125 / 0.12) < 1e-9)
  }

  test("windowRatio ignores FAILED calibration samples and degrades " +
    "to 1.0 on empty/invalid input") {
    val withFail = Seq((0, 0.12, true), (20, 33.0, false), (40, 0.13, true))
    assert(Bench.windowRatio(withFail, 20, 0.12) < Bench.ContentionThreshold)
    assert(Bench.windowRatio(Nil, 10, 0.12) === 1.0)
    assert(Bench.windowRatio(quiet, 10, Double.NaN) === 1.0)
    assert(Bench.windowRatio(quiet, 10, 0.0) === 1.0)
  }

  test("a >1.5x mover whose every measurement window was contended is " +
    "UNRESOLVED_CONTENTION, never an unannotated regression") {
    // r13 phantom: 4.5x ratio, sweep window 6x, retry window 5.8x
    assert(Bench.moverVerdict(4.5, Seq(6.0, 5.8)) === "unresolved_contention")
    // one clean retry window → the regression is real
    assert(Bench.moverVerdict(4.5, Seq(6.0, 1.1)) === "persists")
    // retry brought it under 1.5x → weather, whatever the windows said
    assert(Bench.moverVerdict(1.2, Seq(6.0, 5.8)) === "weather")
    // no window evidence at all (no calibration) → default persists
    assert(Bench.moverVerdict(2.0, Nil) === "persists")
  }
}
