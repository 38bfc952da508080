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

  it should "self-heal from one lucky-fast sample without ever false-flagging" in {
    // round N: anomaly 1.7 against steady 3.6 -> baseline 1.8 (capped)
    val poisoned = ratchetBaseline(Map("q" -> 3.6), Map("q" -> 1.7), Set.empty)
    // round N+1 on: steady 3.6 again. 3.6 <= 2 * 1.8, so the tracker's
    // suspicious() gate cannot flag it at any point, and the baseline
    // recovers at the 1.25x loosening cap per round (r17)
    val steady = 3.6
    assert(steady <= 2 * poisoned("q"))
    var b = poisoned
    (1 to 4).foreach { _ =>
      assert(steady <= 2 * b("q")) // never flaggable during recovery
      b = ratchetBaseline(b, Map("q" -> steady), Set.empty)
    }
    b("q") shouldBe 3.6 +- 1e-9 // 1.8 -> 2.25 -> 2.8125 -> 3.516 -> the honest 3.6
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

  it should "cap loosening adoption at 1.25x per run (r16 cap, tightened r17)" in {
    // two observed classes motivate the cap: (r16) single-sample jitter —
    // q07's 0.37 s denominator posted 6.17 against its quiet 1.8 in a
    // probe-certified window; (r17) PROBE-INVISIBLE contention — close-d's
    // CPU and shuffle probes both sat in the quiet band while wall-driven
    // legs inflated ~30% and the certified reseed loosened 98 ratio + 118
    // absolute entries at a 1.38x median, many AT the old 2x cap. At
    // 1.25x a certified-but-contended window costs <= 25% sensitivity
    ratchetBaseline(Map("q" -> 1.8), Map("q" -> 6.17), Set.empty) shouldBe Map("q" -> 2.25)
    // a one-off spike decays as soon as the honest ratio returns...
    ratchetBaseline(Map("q" -> 2.25), Map("q" -> 1.9), Set.empty) shouldBe Map("q" -> 1.9)
    // ...while a real persistent growth still converges, 1.25x per round:
    // 1.8 -> 2.25 -> 2.81 -> 3.52 -> 4.39 -> 5.49 -> the honest 6.17
    var g = Map("q" -> 1.8)
    (1 to 5).foreach(_ => g = ratchetBaseline(g, Map("q" -> 6.17), Set.empty))
    g("q") shouldBe (1.8 * math.pow(1.25, 5)) +- 1e-9
    ratchetBaseline(g, Map("q" -> 6.17), Set.empty)("q") shouldBe 6.17
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

  it should "not grant robust when the chosen min dips below 1 s (r15 ADVICE)" in {
    // a >= 1 s first pass whose single re-run lands at 0.8 s: the chosen
    // denominator is a min-of-two single sub-second sample, not a median
    // of three — the lowered line (8) must NOT apply to it. The non-robust
    // verdict sends it through the 15x single-sample line instead.
    confirmedSmall(1.2, Seq(0.8)) shouldBe ((0.8, false))
    // exactly at the boundary the denominator is reliable again
    confirmedSmall(1.2, Seq(1.0)) shouldBe ((1.0, true))
  }

  it should "fall back non-robust when every re-time failed" in {
    confirmedSmall(0.43, Seq.empty) shouldBe ((0.43, false))
  }

  import graft.Bench.{gatedRatchetBaseline, CalibReseedBand}

  // The r15 driver incident, in numbers: quiet probes 1.228-1.264, the
  // driver window 1.328-1.413, and the driver reseed moved q67's baseline
  // 1.022 -> 2.487 — halving flag sensitivity (flag line is 2x baseline).
  "gatedRatchetBaseline" should "refuse to loosen entries from a noisy window" in {
    val (b, c) = gatedRatchetBaseline(
      prev = Map("q67" -> 1.022, "q07" -> 1.816),
      current = Map("q67" -> 2.487, "q07" -> 4.339),
      regressed = Set.empty, prevCalib = Some(1.228), runCalib = 1.413)
    b shouldBe Map("q67" -> 1.022, "q07" -> 1.816) // inflated ratios rejected
    c shouldBe Some(1.228)                          // reference probe kept
  }

  it should "still adopt tightening and new entries from a noisy window" in {
    // a ratio that DROPPED under window inflation is real a fortiori, and
    // a first measurement has no alternative seed
    val (b, c) = gatedRatchetBaseline(
      prev = Map("q1" -> 3.0, "q2" -> 2.0),
      current = Map("q1" -> 2.4, "q2" -> 4.0, "qNew" -> 5.0),
      regressed = Set.empty, prevCalib = Some(1.23), runCalib = 1.40)
    b shouldBe Map("q1" -> 2.4, "q2" -> 2.0, "qNew" -> 5.0)
    c shouldBe Some(1.23)
  }

  it should "reseed from a quiet window (loosen-capped) and ratchet the probe down" in {
    val (b, c) = gatedRatchetBaseline(
      prev = Map("q" -> 1.8), current = Map("q" -> 3.4),
      regressed = Set.empty, prevCalib = Some(1.264), runCalib = 1.234)
    b shouldBe Map("q" -> 2.25)  // healthy tracking, capped at 1.25x/run
    c shouldBe Some(1.234)       // quietest probe seen becomes the reference
    // within the band but slightly slower: reseed allowed, probe NOT raised
    // (the band must not creep upward by 5% per round)
    val (b2, c2) = gatedRatchetBaseline(
      prev = b, current = Map("q" -> 2.5),
      regressed = Set.empty, prevCalib = c, runCalib = 1.26)
    assert(1.26 <= 1.234 * CalibReseedBand)
    b2 shouldBe Map("q" -> 2.5)  // within the cap: tracked exactly
    c2 shouldBe Some(1.234)
  }

  it should "bootstrap a pre-gate baseline and keep the regression rule" in {
    // no recorded probe (r15-format file): adopt and start recording
    val (b, c) = gatedRatchetBaseline(
      prev = Map("q" -> 2.0), current = Map("q" -> 2.2, "r" -> 9.0),
      regressed = Set("r"), prevCalib = None, runCalib = 1.25)
    b("q") shouldBe 2.2
    c shouldBe Some(1.25)
    // a REGRESSED entry keeps its previous baseline even on a quiet run
    val (b3, _) = gatedRatchetBaseline(
      prev = Map("r" -> 3.0), current = Map("r" -> 9.0),
      regressed = Set("r"), prevCalib = Some(1.25), runCalib = 1.25)
    b3 shouldBe Map("r" -> 3.0)
  }

  it should "treat a failed probe as a noisy window" in {
    // a run that cannot certify its window must not loosen the baseline
    val (b, c) = gatedRatchetBaseline(
      prev = Map("q" -> 1.8), current = Map("q" -> 4.3),
      regressed = Set.empty, prevCalib = Some(1.23), runCalib = -1.0)
    b shouldBe Map("q" -> 1.8)
    c shouldBe Some(1.23)
  }

  import graft.Bench.ratchetVerdict

  // The two-phase screen -> confirm composition, driven end-to-end by a
  // fake timing source (r15 verdict item 3: it existed only as a comment).
  "ratchetVerdict" should "re-time a lucky-fast sub-second first pass and un-flag it" in {
    var bigCalls = 0; var smallCalls = 0; var smallN = -1
    // screen: ratio0 10.0 > robust line 8 on a 0.14 s denominator -> candidate
    val (ratio, flagged) = ratchetVerdict(
      ratio0 = 10.0, baseline = 2.0, big0 = 1.4, small0 = 0.14,
      retimeBig = () => { bigCalls += 1; 1.4 },
      retimeSmall = n => { smallCalls += 1; smallN = n; Seq(0.55, 0.60, 0.50) })
    bigCalls shouldBe 1
    smallCalls shouldBe 1
    smallN shouldBe 3                    // sub-second leg re-times 3x
    ratio shouldBe (1.4 / 0.55) +- 1e-9  // median denominates, not the suspect
    flagged shouldBe false               // 2.5x is under both lines
  }

  it should "flag a blowup that reproduces in every confirmation sample" in {
    val (ratio, flagged) = ratchetVerdict(
      ratio0 = 24.0, baseline = 2.0, big0 = 12.0, small0 = 0.5,
      retimeBig = () => 12.2,
      retimeSmall = _ => Seq(0.52, 0.48, 0.50))
    ratio shouldBe (12.0 / 0.50) +- 1e-9
    flagged shouldBe true
  }

  it should "never time a non-candidate" in {
    var calls = 0
    val (ratio, flagged) = ratchetVerdict(
      ratio0 = 3.4, baseline = 2.0, big0 = 5.0, small0 = 1.5,
      retimeBig = () => { calls += 1; 5.0 },
      retimeSmall = n => { calls += 1; Seq.fill(n)(1.5) })
    calls shouldBe 0
    (ratio, flagged) shouldBe ((3.4, false))
  }

  it should "re-time a >= 1 s denominator once and min the big leg" in {
    var smallN = -1
    val (ratio, flagged) = ratchetVerdict(
      ratio0 = 8.0, baseline = 2.0, big0 = 9.6, small0 = 1.2,
      retimeBig = () => 8.8,               // stall did not reproduce
      retimeSmall = n => { smallN = n; Seq(1.3) })
    smallN shouldBe 1
    ratio shouldBe (8.8 / 1.2) +- 1e-9     // min big / min small
    flagged shouldBe true                  // 7.3x > 2x baseline with robust legs
  }

  it should "apply the single-sample line when every re-time failed" in {
    // confirmation could not produce a robust denominator: the 15x line
    // governs, so a 10x ratio on the lone sub-second sample stays quiet
    val (ratio, flagged) = ratchetVerdict(
      ratio0 = 10.0, baseline = 2.0, big0 = 1.4, small0 = 0.14,
      retimeBig = () => 1.4,
      retimeSmall = _ => Seq.empty)
    ratio shouldBe 10.0 +- 1e-9
    flagged shouldBe false
  }

  import graft.Bench.{probeNormalize, absSuspicious, absVerdict}

  // The absolute-time tracker (r16 verdict item 1): the class the ratio
  // ratchet is structurally blind to, pinned with the literal r16 driver
  // record — q88_pipeline_segments 25.0 s against its 8.8-12.1 s band and
  // q65_curation_report 8.7 s against ~3.2 s, both with UNCHANGED ratios,
  // in a window probing 1.356 against the committed quiet reference 1.257.
  "probeNormalize" should "deflate a noisy window's time to quiet-equivalent" in {
    // the r16 driver window: 1.079x inflation estimate divides out
    probeNormalize(25.0, Some(1.257), 1.356) shouldBe (25.0 * 1.257 / 1.356) +- 1e-9
  }

  it should "never inflate: a quieter-than-reference probe is a new quiet window" in {
    // scaling UP by a probe ratio would manufacture regressions from
    // probe jitter; the raw time of a quieter window is already
    // quiet-equivalent (and the gate will ratchet the reference down)
    probeNormalize(10.0, Some(1.257), 1.200) shouldBe 10.0
    probeNormalize(10.0, Some(1.257), 1.257) shouldBe 10.0
  }

  it should "pass raw times through with no reference or no probe" in {
    probeNormalize(10.0, None, 1.3) shouldBe 10.0      // bootstrap: seed only
    probeNormalize(10.0, Some(1.257), -1.0) shouldBe 10.0 // failed probe
  }

  "absSuspicious" should "flag the r16 q65 datum and the 2x line exactly" in {
    // q65: 8.7 s in the 1.356 window normalizes to 8.06 vs ~3.2 baseline
    val q65 = probeNormalize(8.7, Some(1.257), 1.356)
    absSuspicious(q65, 3.2) shouldBe true
    // q88 at the TOP of its recorded band (12.1): 23.17 normalized is
    // under 2x24.2 — the 2x line is deliberate (the band top already
    // absorbed growth); at the band floor it flags
    val q88 = probeNormalize(25.0, Some(1.257), 1.356)
    absSuspicious(q88, 12.1) shouldBe false
    absSuspicious(q88, 8.8) shouldBe true
  }

  it should "require a full second of reproduced growth (the r17 stall datum)" in {
    // the first unattended abs flags were FALSE positives: q30/q33
    // (baselines 0.511/0.505) posted 1.04/1.27 s normalized across every
    // pass of a probe-1.49-1.69 stalled window — a 2-3x host stall on a
    // sub-second entry reproduces within the window and a probe cannot
    // fully divide it out. Sub-second noise cannot manufacture a
    // reproduced SECOND of growth:
    absSuspicious(probeNormalize(1.394, Some(1.257), 1.687), 0.511) shouldBe false
    absSuspicious(probeNormalize(1.705, Some(1.257), 1.687), 0.505) shouldBe false
    // ...while a real 0.5 -> 2 s regression still clears both lines
    absSuspicious(2.0, 0.5) shouldBe true
    // and marginal sub-second growth stays quiet regardless of the ratio
    absSuspicious(0.9, 0.2) shouldBe false
    absSuspicious(1.1, 0.2) shouldBe false
  }

  it should "never flag an entry with no baseline (bootstrap)" in {
    absSuspicious(25.0, Double.PositiveInfinity) shouldBe false
  }

  "absVerdict" should "un-flag a stall that does not reproduce on re-time" in {
    var calls = 0
    // first pass 25.0 flags vs baseline 10; the re-time lands in-band —
    // min-of-passes takes it and the flag clears (a stall inflates one
    // pass, not both)
    val (norm, flagged) = absVerdict(25.0, 10.0, Some(1.257), 1.257,
      retime = () => { calls += 1; 10.8 })
    calls shouldBe 1
    norm shouldBe 10.8 +- 1e-9
    flagged shouldBe false
  }

  it should "flag a regression that reproduces" in {
    val (norm, flagged) = absVerdict(25.0, 10.0, Some(1.257), 1.257,
      retime = () => 24.1)
    norm shouldBe 24.1 +- 1e-9
    flagged shouldBe true
  }

  it should "never re-time a non-candidate" in {
    var calls = 0
    val (norm, flagged) = absVerdict(11.0, 10.0, Some(1.257), 1.257,
      retime = () => { calls += 1; 11.0 })
    calls shouldBe 0
    (norm, flagged) shouldBe ((11.0, false))
  }

  it should "keep the first pass standing when the re-time fails" in {
    val (norm, flagged) = absVerdict(25.0, 10.0, Some(1.257), 1.257,
      retime = () => -1.0)
    norm shouldBe 25.0 +- 1e-9
    flagged shouldBe true
  }

  it should "ride the same ratchet: a flagged absolute keeps its baseline" in {
    // the regressed-keeps-baseline rule applies to "abs:" entries through
    // the SAME gatedRatchetBaseline call the ratios use — a persistent
    // absolute regression keeps flagging instead of becoming the new normal
    val (b, _) = gatedRatchetBaseline(
      prev = Map("q88" -> 10.0), current = Map("q88" -> 23.2),
      regressed = Set("q88"), prevCalib = Some(1.257), runCalib = 1.257)
    b shouldBe Map("q88" -> 10.0)
  }
}
