package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable exact order statistics.
  *
  * WordMedian (hadoop-mapreduce-examples WordMedian.java:122-158) computes an
  * EXACT median by scanning a sorted histogram. Spark's `median`/`percentile`
  * are exact too but buffer every value per group — fine per-group, hostile
  * at 100 TB for a global median. This is the scale path (SURVEY §7.4):
  *
  *  1. one pass: count n (→ target ranks k1=(n-1)/2, k2=n/2);
  *  2. `approxQuantile` brackets the median (Greenwald-Khanna sketch, one pass);
  *  3. the bracket slice — a small, error-bounded fraction of the data — is
  *     distributed-sorted and the exact ranks are picked by zipWithIndex;
  *     no driver-side data collect (only the two rank rows come back).
  *  4. if the sketch error put the target ranks outside the bracket, widen
  *     and retry (bounded geometric loop).
  */
object Stats {

  def exactMedian(df: DataFrame, column: String): Double = {
    val vals = df.select(col(column).cast("double").as("v")).filter(col("v").isNotNull)
    val n = vals.count()
    if (n == 0) return Double.NaN
    val k1 = (n - 1) / 2
    val k2 = n / 2
    var err = 0.001
    var attempt = 0
    while (attempt < 8) {
      // quantiles 0.5 ∓ 2*err have true rank error ≤ err*n each side, so
      // [lo, hi] contains the true median ranks with margin
      val probs = Array(math.max(0.0, 0.5 - 2 * err), math.min(1.0, 0.5 + 2 * err))
      val Array(lo, hi) = vals.stat.approxQuantile("v", probs, err)
      val below = vals.filter(col("v") < lo).count()
      val bracketCount = vals.filter(col("v") >= lo && col("v") <= hi).count()
      if (below <= k1 && k2 < below + bracketCount) {
        val ranked = vals.filter(col("v") >= lo && col("v") <= hi)
          .sort(col("v")).rdd.map(_.getDouble(0)).zipWithIndex()
        val need = Set(k1 - below, k2 - below)
        val picked = ranked.filter { case (_, i) => need(i) }.map(_._1).collect().sorted
        return (picked.head + picked.last) / 2.0
      }
      err = math.max(err * 4, 0.005 * (attempt + 1))
      attempt += 1
    }
    // fallback: exact but memory-heavy (testdata scale only)
    vals.stat.approxQuantile("v", Array(0.5), 0.0).head
  }
}
