package graft.bench

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.Bench.ratchetBaseline

/** The scaling tracker's baseline-persistence rule, pinned against the two
  * failure modes observed in practice: a regression becoming the new normal
  * after one run, and a single lucky-fast sample poisoning the baseline low
  * so a healthy query flags as a false regression forever. */
class ScalingRatchetSpec extends AnyFlatSpec with Matchers {

  "ratchetBaseline" should "keep the previous ratio for a regressed query" in {
    ratchetBaseline(Map("q" -> 3.0), Map("q" -> 8.0), Set("q")) shouldBe Map("q" -> 3.0)
  }

  it should "track the measurement for a healthy query" in {
    ratchetBaseline(Map("q" -> 3.0), Map("q" -> 3.4), Set.empty) shouldBe Map("q" -> 3.4)
  }

  it should "cap improvement adoption at 2x per run" in {
    // lucky-fast sample: 3.6 -> 1.7 must not be adopted wholesale
    ratchetBaseline(Map("q" -> 3.6), Map("q" -> 1.7), Set.empty) shouldBe Map("q" -> 1.8)
  }

  it should "self-heal from one lucky-fast sample within a round" in {
    // round N: anomaly 1.7 against steady 3.6 -> baseline 1.8 (capped)
    val poisoned = ratchetBaseline(Map("q" -> 3.6), Map("q" -> 1.7), Set.empty)
    // round N+1: steady 3.6 again. 3.6 <= 2 * 1.8, so the tracker's
    // suspicious() gate cannot flag it, and the baseline recovers fully.
    val steady = 3.6
    assert(steady <= 2 * poisoned("q"))
    ratchetBaseline(poisoned, Map("q" -> steady), Set.empty) shouldBe Map("q" -> 3.6)
  }

  it should "converge on a genuine large improvement by halving" in {
    // a real 8x improvement (16.0 -> 2.0) reaches the baseline in 3 rounds
    val r1 = ratchetBaseline(Map("q" -> 16.0), Map("q" -> 2.0), Set.empty)
    r1("q") shouldBe 8.0
    val r2 = ratchetBaseline(r1, Map("q" -> 2.0), Set.empty)
    r2("q") shouldBe 4.0
    val r3 = ratchetBaseline(r2, Map("q" -> 2.0), Set.empty)
    r3("q") shouldBe 2.0
  }

  it should "adopt first measurements and keep absent queries" in {
    ratchetBaseline(Map("old" -> 2.5), Map("new" -> 1.7), Set.empty) shouldBe
      Map("old" -> 2.5, "new" -> 1.7)
  }

  import graft.Bench.scalingSuspicious

  "scalingSuspicious" should "flag a doubled ratio only with a reliable (>= 1 s) small leg" in {
    // the r14 session's observed false positives: same-code runs moved
    // q49's ratio 2.5 -> 6.5 and q51's 1.8 -> 5.1 purely on sub-second
    // sf0.01 denominators (±0.2 s of JIT/host noise is a whole multiple)
    scalingSuspicious(6.5, 2.5, big = 2.8, small = 0.43) shouldBe false
    scalingSuspicious(5.1, 1.8, big = 2.9, small = 0.57) shouldBe false
    // the same doubled ratio with a reliable denominator IS a flag
    scalingSuspicious(6.5, 2.5, big = 14.0, small = 2.2) shouldBe true
  }

  it should "still catch a latent quadratic behind a sub-second small leg" in {
    // a true blowup dwarfs denominator noise: 0.5 s -> 50 s is ratio 100
    scalingSuspicious(100.0, 2.5, big = 50.0, small = 0.5) shouldBe true
    // the documented latent-quadratic line is the sub-second threshold
    scalingSuspicious(15.1, 2.5, big = 7.5, small = 0.5) shouldBe true
    scalingSuspicious(14.9, 2.5, big = 7.5, small = 0.5) shouldBe false
  }

  it should "keep the original guards: doubling, ratio > 3, big >= 1 s" in {
    scalingSuspicious(4.0, 2.5, big = 5.0, small = 2.0) shouldBe false // not doubled
    scalingSuspicious(2.9, 1.0, big = 5.0, small = 2.0) shouldBe false // ratio <= 3
    scalingSuspicious(6.5, 2.5, big = 0.9, small = 2.0) shouldBe false // big < 1 s
  }

  it should "lower the sub-second line to 8 for a MEDIAN-of-3 denominator (r15)" in {
    // the r14 mute: a real (2x-baseline, 15x] regression behind a
    // sub-second denominator could NEVER flag. With a median-of-3 re-timed
    // denominator (robustSmall), the band (8, 15] regains coverage...
    scalingSuspicious(14.9, 2.5, big = 7.5, small = 0.5, robustSmall = true) shouldBe true
    scalingSuspicious(9.0, 2.5, big = 4.5, small = 0.5, robustSmall = true) shouldBe true
    // ...while the session's observed false positives (ratios 5-6.5 on
    // sub-second denominators — the sublinear-absolute noise class) stay
    // non-flags EVEN when the denominator is robust
    scalingSuspicious(6.5, 2.5, big = 2.8, small = 0.43, robustSmall = true) shouldBe false
    scalingSuspicious(5.1, 1.8, big = 2.9, small = 0.57, robustSmall = true) shouldBe false
    // a >= 1 s denominator never needed the line: robustSmall is irrelevant
    scalingSuspicious(6.5, 2.5, big = 14.0, small = 2.2, robustSmall = true) shouldBe true
    scalingSuspicious(4.0, 2.5, big = 5.0, small = 2.0, robustSmall = true) shouldBe false
  }

  import graft.Bench.confirmedSmall

  "confirmedSmall" should "median the re-timed runs for a sub-second first pass" in {
    // the suspect lucky-fast first pass (0.43) does NOT vote: the median is
    // over the three re-timed runs alone
    confirmedSmall(0.43, Seq(0.62, 0.41, 0.65)) shouldBe ((0.62, true))
    // a reproduced fast denominator IS the honest value
    confirmedSmall(0.43, Seq(0.44, 0.42, 0.45)) shouldBe ((0.44, true))
  }

  it should "keep the min-of-passes for a >= 1 s first pass" in {
    confirmedSmall(1.4, Seq(1.2)) shouldBe ((1.2, true))
    confirmedSmall(1.1, Seq(1.6)) shouldBe ((1.1, true))
  }

  it should "fall back non-robust when every re-time failed" in {
    confirmedSmall(0.43, Seq.empty) shouldBe ((0.43, false))
  }
}
