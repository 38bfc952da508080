package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed Sudoku solving — the other member of the reference's
  * search-space family (hadoop-mapreduce-examples
  * EX/dancing/Sudoku.java:30, single-node in the reference; fan-out here is
  * one puzzle per task, the natural Spark shape for a solver batch).
  * Bitmask backtracking over the 9x9 exact-cover constraints — the standard
  * published technique, not a dancing-links port.
  */
object Sudoku {

  /** Solve a 81-char puzzle ('0' or '.' = blank). Returns the first solution
    * and the solution count capped at `maxCount` (2 proves (non)uniqueness
    * without exhausting pathological puzzles). */
  def solve(puzzle: String, maxCount: Int = 2): (Option[String], Int) = {
    require(puzzle.length == 81, "puzzle must be 81 chars")
    val grid = puzzle.map(c => if (c == '.' || c == '0') 0 else c - '0').toArray
    val rows = new Array[Int](9)
    val cols = new Array[Int](9)
    val boxes = new Array[Int](9)
    def boxOf(i: Int) = (i / 9 / 3) * 3 + (i % 9) / 3
    var i = 0
    while (i < 81) {
      val v = grid(i)
      if (v != 0) {
        val bit = 1 << v
        require((rows(i / 9) & bit) == 0 && (cols(i % 9) & bit) == 0 &&
          (boxes(boxOf(i)) & bit) == 0, s"invalid clues at cell $i")
        rows(i / 9) |= bit; cols(i % 9) |= bit; boxes(boxOf(i)) |= bit
      }
      i += 1
    }
    var found = 0
    var first: String = null
    def search(pos: Int): Unit = {
      if (found >= maxCount) return
      var p = pos
      while (p < 81 && grid(p) != 0) p += 1
      if (p == 81) {
        found += 1
        if (first == null) first = grid.mkString
        return
      }
      val used = rows(p / 9) | cols(p % 9) | boxes(boxOf(p))
      var v = 1
      while (v <= 9 && found < maxCount) {
        val bit = 1 << v
        if ((used & bit) == 0) {
          grid(p) = v
          rows(p / 9) |= bit; cols(p % 9) |= bit; boxes(boxOf(p)) |= bit
          search(p + 1)
          rows(p / 9) &= ~bit; cols(p % 9) &= ~bit; boxes(boxOf(p)) &= ~bit
          grid(p) = 0
        }
        v += 1
      }
    }
    search(0)
    (Option(first), found)
  }

  /** The canonical valid grid value(r, c) = (3r + r/3 + c) mod 9 + 1, shifted
    * by `digitShift` (a validity-preserving relabeling). */
  def canonicalValue(r: Int, c: Int, digitShift: Int): Int =
    (r * 3 + r / 3 + c + digitShift) % 9 + 1

  /** Deterministic puzzle `pid`: the shifted canonical grid with every cell i
    * where (7i + pid) % 4 == 0 blanked (~20 blanks → unique solution,
    * asserted by the solver's count). */
  def syntheticPuzzle(pid: Int): String =
    (0 until 81).map { i =>
      if ((i * 7 + pid) % 4 == 0) '0'
      else ('0' + canonicalValue(i / 9, i % 9, pid)).toChar
    }.mkString

  /** Solve `n` synthetic puzzles, one task each: (puzzle_id, solution,
    * n_solutions). n_solutions is capped at 2 — 1 in the output doubles as a
    * uniqueness proof per puzzle. */
  def solvePuzzles(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, n)
      .map { pid =>
        val (sol, cnt) = solve(syntheticPuzzle(pid.toInt))
        (pid, sol.getOrElse(""), cnt.toLong)
      }
      .toDF("puzzle_id", "solution", "n_solutions")
  }
}
