package graft.bench

import graft.SparkSpec
import java.math.BigInteger

/** Cross-checks the two-long 128-bit arithmetic and the LCG against an
  * independent BigInteger implementation of the published recurrence. */
class GenSortParitySpec extends SparkSpec {

  private val MOD = BigInteger.ONE.shiftLeft(128)
  private val A = new BigInteger("2360ed051fc65da44385df649fccf645", 16)
  private val C = new BigInteger("4a696d47726179524950202020202001", 16)

  private def big(hi: Long, lo: Long): BigInteger =
    new BigInteger(java.lang.Long.toUnsignedString(hi), 10).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo), 10))

  private def step(x: BigInteger): BigInteger = A.multiply(x).add(C).mod(MOD)

  test("squaring table matches published rand16 values") {
    // entries [1] and [2] of the published genArray (rand16.c)
    val (a1h, a1l, c1h, c1l) = GenSortParity.gen(1)
    assert(big(a1h, a1l).toString(16) == "17bce35bdf69743c529ed9eb20e0ae99")
    assert(big(c1h, c1l).toString(16) == "95e0e48262b3edfe04479485c755b646")
    val (a2h, a2l, c2h, c2l) = GenSortParity.gen(2)
    assert(big(a2h, a2l).toString(16) == "f4dd417327db7a9bd194dfbe42d45771")
    assert(big(c2h, c2l).toString(16) == "882a02c315362b60765f100068b33a1c")
  }

  test("skipAhead(r) + nextRand equals r+1 sequential BigInteger steps") {
    for (row <- Seq(0L, 1L, 7L, 63L, 1000L)) {
      val s = GenSortParity.nextRand(GenSortParity.skipAhead(row))
      var x = BigInteger.ZERO
      var i = 0L
      while (i <= row) { x = step(x); i += 1 }
      assert(big(s._1, s._2) == x, s"row $row")
    }
  }

  test("record layout matches the gensort format") {
    val s = GenSortParity.nextRand(GenSortParity.skipAhead(0L))
    val rec = GenSortParity.generateRecord(s._1, s._2, 0L)
    assert(rec.length == 100)
    assert(rec(10) == 0x00 && rec(11) == 0x11)
    assert((12 until 44).forall(i => rec(i) == '0')) // rowId 0 → 32 zero hex digits
    assert(rec(44) == 0x88.toByte && rec(47) == 0xBB.toByte)
    assert(rec(96) == 0xCC.toByte && rec(99) == 0xFF.toByte)
    // key = high 10 bytes of the random state
    val expected = big(s._1, s._2).toString(16).reverse.padTo(32, '0').reverse.take(20)
    val gotKeyHex = rec.take(10).map(b => f"${b & 0xff}%02x").mkString
    assert(gotKeyHex == expected)
    // filler block: 12 groups of 4 identical ascii-hex bytes
    assert((0 until 12).forall { g =>
      val v = rec(48 + g * 4)
      (1 to 3).forall(j => rec(48 + g * 4 + j) == v)
    })
  }

  test("distributed teraGen matches single-threaded generation") {
    val rows = GenSortParity.teraGen(spark, 100).collect().sortBy(_.getLong(0))
    assert(rows.length == 100)
    var st = (0L, 0L)
    for (r <- 0 until 100) {
      st = GenSortParity.nextRand(st)
      val rec = GenSortParity.generateRecord(st._1, st._2, r.toLong)
      assert(rows(r).getAs[Array[Byte]](1).sameElements(rec.take(10)), s"key row $r")
      assert(rows(r).getAs[Array[Byte]](2).sameElements(rec.drop(10)), s"value row $r")
    }
  }
}
