package graft.bench

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.Bench.{calibrationWork, calibSparkPlan, CalibExpected, CalibReps}

/** The fixed-work calibration kernel the bench records as `calib_cpu`:
  * its whole value is that two windows' probe times divide into a host
  * speed ratio, which requires the work to be BIT-IDENTICAL every run.
  * Pinned here against the constant the bench's own timed runs `require`,
  * so a kernel change is a loud two-file diff, never a silent
  * recalibration that would make round-over-round probe ratios lie. */
class CalibrationProbeSpec extends AnyFlatSpec with Matchers {

  "calibrationWork" should "produce the pinned accumulator at the bench's rep count" in {
    calibrationWork(CalibReps) shouldBe CalibExpected
  }

  it should "be deterministic across invocations" in {
    calibrationWork(1) shouldBe calibrationWork(1)
  }

  it should "do rep-dependent work (reps are not collapsed)" in {
    // each rep xors a distinct sorted-stream hash into the accumulator —
    // a kernel that stopped iterating would produce the 1-rep value
    calibrationWork(1) should not be CalibExpected
    calibrationWork(1) shouldBe 6569892822389010793L
  }

  "calibSparkPlan" should "keep the global sort in the physical plan" in {
    // the Spark probe's value rests on the sort SURVIVING optimization: if
    // a future change let Catalyst elide it (e.g. an aggregate landing on
    // top, or a sort-removal rule firing), calib_spark would silently time
    // an empty pipeline and every cross-window division would lie
    val plan = calibSparkPlan(graft.TestSession.spark)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Sort "),
      s"calib_spark plan lost its sort:\n${plan.take(1500)}")
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"calib_spark plan lost its range exchange (single-partition sort?):\n${plan.take(1500)}")
  }
}
