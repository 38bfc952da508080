package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gensort-bit-compatible record generation.
  *
  * The sort-benchmark data generator (Chris Nyberg's rand16.c/gensort.c, the
  * published standard; reference behavior: EX/terasort/Random16.java,
  * GenSort.java:39-75, Unsigned16.java) is a 128-bit LCG
  * `f(x) = (A*x + C) mod 2^128` with A from L'Ecuyer, "Tables of linear
  * congruential generators..." (Math. Comp. 68, 1999) and odd C, advanced by
  * row via repeated squaring (f^(2^i) tables), and a fixed 100-byte record
  * layout: 10 key bytes from the high random bits, break bytes, 32 uppercase
  * hex digits of the row id, break, 12x4 repeated hex filler from the low
  * random nibbles, break.
  *
  * Implemented from the algorithm: only the two published base constants are
  * carried; the squaring table is DERIVED (a_{i+1}=a_i^2, c_{i+1}=(a_i+1)c_i
  * mod 2^128), which the unit test cross-checks against independent
  * BigInteger arithmetic.
  */
object GenSortParity {

  // f(x) = (A*x + C) mod 2^128 — base constants of the gensort generator.
  private val A0 = (0x2360ed051fc65da4L, 0x4385df649fccf645L)
  private val C0 = (0x4a696d4772617952L, 0x4950202020202001L)

  @inline private def unsignedMulHigh(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  /** (ah,al) * (bh,bl) mod 2^128 */
  @inline def mul128(ah: Long, al: Long, bh: Long, bl: Long): (Long, Long) = {
    val lo = al * bl
    val hi = ah * bl + al * bh + unsignedMulHigh(al, bl)
    (hi, lo)
  }

  /** (ah,al) + (bh,bl) mod 2^128 */
  @inline def add128(ah: Long, al: Long, bh: Long, bl: Long): (Long, Long) = {
    val lo = al + bl
    val carry = if (java.lang.Long.compareUnsigned(lo, al) < 0) 1L else 0L
    (ah + bh + carry, lo)
  }

  /** gen(i) = (a, c) of f^(2^i); gen(0) = (A0, C0). */
  private[bench] val gen: Array[(Long, Long, Long, Long)] = {
    val out = new Array[(Long, Long, Long, Long)](64)
    var a = A0
    var c = C0
    out(0) = (a._1, a._2, c._1, c._2)
    var i = 1
    while (i < 64) {
      // f∘f: a' = a*a ; c' = (a+1)*c
      val aPlus1 = add128(a._1, a._2, 0L, 1L)
      val c2 = mul128(aPlus1._1, aPlus1._2, c._1, c._2)
      val a2 = mul128(a._1, a._2, a._1, a._2)
      a = a2; c = c2
      out(i) = (a._1, a._2, c._1, c._2)
      i += 1
    }
    out
  }

  /** State after `row` applications of f starting from 0 (row < 2^63). */
  def skipAhead(row: Long): (Long, Long) = {
    var s = (0L, 0L)
    var bits = row
    var i = 0
    while (bits != 0 && i < 64) {
      if ((bits & (1L << i)) != 0) {
        val (ah, al, ch, cl) = gen(i)
        val m = mul128(ah, al, s._1, s._2)
        s = add128(m._1, m._2, ch, cl)
        bits &= ~(1L << i)
      }
      i += 1
    }
    s
  }

  /** One LCG step. */
  @inline def nextRand(s: (Long, Long)): (Long, Long) = {
    val m = mul128(A0._1, A0._2, s._1, s._2)
    add128(m._1, m._2, C0._1, C0._2)
  }

  @inline private def byteOf(hi: Long, lo: Long, b: Int): Byte =
    if (b < 8) (hi >>> (56 - 8 * b)).toByte else (lo >>> (120 - 8 * b)).toByte

  @inline private def hexDigit(hi: Long, lo: Long, p: Int): Byte = {
    var d = byteOf(hi, lo, p / 2).toInt
    if (p % 2 == 0) d >>>= 4
    d &= 0xf
    (if (d < 10) '0' + d else 'A' + d - 10).toByte
  }

  /** The 100-byte gensort "binary" record for (rand, rowId). */
  def generateRecord(randHi: Long, randLo: Long, rowId: Long): Array[Byte] = {
    val buf = new Array[Byte](100)
    var i = 0
    while (i < 10) { buf(i) = byteOf(randHi, randLo, i); i += 1 }
    buf(10) = 0x00; buf(11) = 0x11
    i = 0
    while (i < 32) { buf(12 + i) = hexDigit(0L, rowId, i); i += 1 }
    buf(44) = 0x88.toByte; buf(45) = 0x99.toByte; buf(46) = 0xAA.toByte; buf(47) = 0xBB.toByte
    i = 0
    while (i < 12) {
      val d = hexDigit(randHi, randLo, 20 + i)
      buf(48 + i * 4) = d; buf(49 + i * 4) = d; buf(50 + i * 4) = d; buf(51 + i * 4) = d
      i += 1
    }
    buf(96) = 0xCC.toByte; buf(97) = 0xDD.toByte; buf(98) = 0xEE.toByte; buf(99) = 0xFF.toByte
    buf
  }

  /** Distributed gensort table: (id, key binary(10), value binary(90)).
    * One skipAhead per partition, then sequential LCG steps — exactly the
    * reference mapper's access pattern (TeraGen.java SortGenMapper). */
  def teraGen(spark: SparkSession, rows: Long): DataFrame = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    spark.range(0, rows, 1, parts)
      .mapPartitions { it =>
        var state: (Long, Long) = null
        var nextRow = -1L
        it.map { row =>
          if (state == null || row != nextRow) state = skipAhead(row)
          state = nextRand(state)
          nextRow = row + 1
          val rec = generateRecord(state._1, state._2, row)
          (row, rec.slice(0, 10), rec.slice(10, 100))
        }
      }
      .toDF("id", "key", "value")
  }
}
