package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bailey–Borwein–Plouffe hex-digit extraction for π.
  *
  * Re-expresses the reference's BaileyBorweinPlouffe example
  * (hadoop-mapreduce-examples .../examples/BaileyBorweinPlouffe.java:73 —
  * mappers each compute a digit range, the reducer concatenates in order).
  * The digit-extraction math is the published BBP algorithm (Bailey, Borwein,
  * Plouffe 1997): digit d needs only O(d) modular exponentiations, no earlier
  * digits — which is exactly why it fans out embarrassingly parallel.
  *
  * Distribution shape: `spark.range` over digit positions, one map per
  * position (≙ the reference's per-range mappers), order restored by the
  * final sort — no shuffle beyond the tiny (pos, digit) result. */
object Bbp {

  /** b^e mod m by square-and-multiply (m ≤ ~2^20 here, no overflow). */
  def powMod(b: Long, e: Long, m: Long): Long = {
    if (m == 1) return 0L
    var result = 1L
    var base = b % m
    var exp = e
    while (exp > 0) {
      if ((exp & 1) == 1) result = result * base % m
      base = base * base % m
      exp >>= 1
    }
    result
  }

  /** Fractional part of Σ_k 16^(d-k) / (8k + j). */
  private def series(j: Int, d: Long): Double = {
    var s = 0.0
    var k = 0L
    while (k <= d) {
      val denom = 8 * k + j
      s += powMod(16, d - k, denom).toDouble / denom
      s -= math.floor(s)
      k += 1
    }
    var t = 0.0
    var kk = d + 1
    var term = math.pow(16.0, (d - kk).toDouble) / (8 * kk + j)
    while (term > 1e-17) {
      t += term
      kk += 1
      term = math.pow(16.0, (d - kk).toDouble) / (8 * kk + j)
    }
    val x = s + t
    x - math.floor(x)
  }

  /** Hex digit of π at 1-based position `pos` after the hex point
    * (pos=1 → '2', the first digit of 243F6A88…). */
  def hexDigitAt(pos: Long): Int = {
    val d = pos - 1
    val x = 4.0 * series(1, d) - 2.0 * series(4, d) - series(5, d) - series(6, d)
    val frac = x - math.floor(x)
    (frac * 16.0).toInt
  }

  /** (pos, hex digit) for positions 1..digits, one task per `perTask` block. */
  def piHexDigits(spark: SparkSession, digits: Int, perTask: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(1, digits + 1L, 1, math.max(1, digits / perTask))
      .map(pos => (pos, "%X".format(hexDigitAt(pos))))
      .toDF("pos", "digit")
  }
}
