package graft.operators

import graft.SparkSpec

/** BBP digit extraction and pentomino search against public constants. */
class MathJobsSpec extends SparkSpec {

  test("BBP hex digits match the known expansion of pi") {
    val known = "243F6A8885A308D313198A2E03707344"
    val got = (1 to 32).map(p => "%X".format(Bbp.hexDigitAt(p.toLong))).mkString
    assert(got == known)
  }

  test("distributed BBP equals local digits") {
    val rows = Bbp.piHexDigits(spark, 16).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1 to 16).forall(p => rows(p.toLong) == "%X".format(Bbp.hexDigitAt(p.toLong))))
  }

  test("pentomino 6x10 raw tiling count is 4 x 2339") {
    val row = Pentomino.solutionCount(spark, width = 10, height = 6).collect().head
    assert(row.getLong(0) == 9356L) // 2339 classic solutions x 4 rectangle symmetries
  }

  test("one-sided piece set: 18 pieces, 6 chiral twins, 90 cells") {
    val names = Pentomino.OneSidedShapes.map(_._1)
    assert(names.size == 18 && names.distinct.size == 18)
    assert(names.count(_.head.isLower) == 6) // twins of F, L, N, P, Y, Z
    assert(names.filter(_.head.isLower).map(_.toUpperCase).toSet ==
      Set("F", "L", "N", "P", "Y", "Z"))
    assert(Pentomino.OneSidedShapes.map(_._2.size).sum == 90)
  }

  test("one-sided pentomino 3x30 count matches the independent exact-cover result") {
    val row = Pentomino.oneSidedSolutionCount(spark, width = 3, height = 30).collect().head
    assert(row.getLong(0) == 184L) // cross-checked by a from-scratch Algorithm X
  }

  test("sudoku: every synthetic puzzle recovers the canonical grid uniquely") {
    (0 until 10).foreach { pid =>
      val (sol, cnt) = Sudoku.solve(Sudoku.syntheticPuzzle(pid))
      val expected = (0 until 81)
        .map(i => ('0' + Sudoku.canonicalValue(i / 9, i % 9, pid)).toChar).mkString
      assert(cnt == 1, s"puzzle $pid has $cnt solutions (must be unique)")
      assert(sol.contains(expected), s"puzzle $pid solved to ${sol.orNull}")
    }
    // a puzzle with too few clues must report non-uniqueness, not a wrong answer
    val (_, many) = Sudoku.solve("0" * 81)
    assert(many == 2) // capped count: >= 2 solutions detected
  }
}
