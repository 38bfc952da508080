package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quasi-Monte-Carlo π estimation with a Halton low-discrepancy sequence.
  *
  * Re-expresses the reference's QuasiMonteCarlo example
  * (hadoop-mapreduce-examples QuasiMonteCarlo.java:78 — HaltonSequence :88,
  * QmcMapper :153 counts inside/outside, QmcReducer :200 sums, estimatePi
  * :249). The Halton radical-inverse is the standard published construction
  * (van der Corput / Halton, bases 2 and 3) — implemented from the math, not
  * the reference code.
  *
  * Distribution shape: `spark.range(numPartitions)` fans out one generator
  * task per partition (≙ one map per split of the reference's synthetic
  * RangeInputFormat); counts partial-aggregate map-side, one tiny shuffle.
  */
object MonteCarlo {

  /** Radical inverse of `i` in `base` — the Halton coordinate in [0, 1). */
  def radicalInverse(i: Long, base: Int): Double = {
    var v = 0.0
    var invBase = 1.0 / base
    var f = invBase
    var n = i
    while (n > 0) {
      v += (n % base) * f
      n /= base
      f *= invBase
    }
    v
  }

  /** (inside, total, pi_est) over `partitions * pointsPerPartition` Halton
    * points on the unit square, counted against the quarter circle. */
  def estimatePi(spark: SparkSession, partitions: Int, pointsPerPartition: Long): DataFrame = {
    import spark.implicits._
    val counts = spark.range(0, partitions.toLong, 1, partitions)
      .as[Long]
      .map { pid =>
        var inside = 0L
        var j = 0L
        while (j < pointsPerPartition) {
          val i = pid * pointsPerPartition + j
          val x = radicalInverse(i, 2) - 0.5
          val y = radicalInverse(i, 3) - 0.5
          if (x * x + y * y <= 0.25) inside += 1
          j += 1
        }
        inside
      }
      .toDF("inside")
    counts.agg(
      sum(col("inside")).as("n_inside"),
      lit(partitions * pointsPerPartition).as("n_total"),
      round(sum(col("inside")) * lit(4.0) / lit(partitions.toDouble * pointsPerPartition), 6)
        .as("pi_est"))
  }
}
