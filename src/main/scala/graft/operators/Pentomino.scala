package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed pentomino tiling counter — the search-fan-out job family.
  *
  * Re-expresses the reference's DistributedPentomino / DancingLinks example
  * (hadoop-mapreduce-examples .../examples/dancing/DistributedPentomino.java:47:
  * the driver enumerates search-tree prefixes, each mapper exhausts its
  * subtree, the reducer sums). The solver here is a bitmask backtracker over
  * the classic exact-cover formulation (fill the lowest empty cell first) —
  * the standard published technique, not a port of the reference's dancing
  * links.
  *
  * Distribution shape: the first-level placements (all ways to cover cell 0)
  * are the fan-out seeds; `spark.range`-style parallelize over seeds, each
  * task depth-first counts its subtree, one tiny sum shuffle. Deterministic
  * by construction. For the 6x10 board the raw count is 9356 = 4 x 2339
  * (each of the 2339 classic solutions appears in the 4 orientations of the
  * rectangle's symmetry group).
  */
object Pentomino {

  /** The 12 free pentominoes as (row, col) cell offsets. */
  val Shapes: Seq[(Char, Seq[(Int, Int)])] = Seq(
    'F' -> Seq((0, 1), (0, 2), (1, 0), (1, 1), (2, 1)),
    'I' -> Seq((0, 0), (1, 0), (2, 0), (3, 0), (4, 0)),
    'L' -> Seq((0, 0), (1, 0), (2, 0), (3, 0), (3, 1)),
    'N' -> Seq((0, 1), (1, 1), (2, 0), (2, 1), (3, 0)),
    'P' -> Seq((0, 0), (0, 1), (1, 0), (1, 1), (2, 0)),
    'T' -> Seq((0, 0), (0, 1), (0, 2), (1, 1), (2, 1)),
    'U' -> Seq((0, 0), (0, 2), (1, 0), (1, 1), (1, 2)),
    'V' -> Seq((0, 0), (1, 0), (2, 0), (2, 1), (2, 2)),
    'W' -> Seq((0, 0), (1, 0), (1, 1), (2, 1), (2, 2)),
    'X' -> Seq((0, 1), (1, 0), (1, 1), (1, 2), (2, 1)),
    'Y' -> Seq((0, 1), (1, 0), (1, 1), (2, 1), (3, 1)),
    'Z' -> Seq((0, 0), (0, 1), (1, 1), (2, 1), (2, 2)))

  private def normalize(cs: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    val mr = cs.map(_._1).min
    val mc = cs.map(_._2).min
    cs.map { case (r, c) => (r - mr, c - mc) }.sorted
  }

  private def reflected(cells: Seq[(Int, Int)]): Seq[(Int, Int)] =
    normalize(cells.map { case (r, c) => (r, -c) })

  /** All distinct orientations, normalized: rotations, plus reflections
    * unless `oneSided` (a one-sided piece may be rotated but not flipped —
    * reference OneSidedPentomino.java:25-27). */
  private def orientations(cells: Seq[(Int, Int)],
                           oneSided: Boolean = false): Seq[Seq[(Int, Int)]] = {
    val all = for {
      reflect <- if (oneSided) Seq(false) else Seq(false, true)
      rot <- 0 until 4
    } yield {
      var cs = if (reflect) cells.map { case (r, c) => (r, -c) } else cells
      (0 until rot).foreach(_ => cs = cs.map { case (r, c) => (c, -r) })
      normalize(cs)
    }
    all.distinct
  }

  /** The 18 one-sided pentominoes (reference OneSidedPentomino.java:40-58):
    * every free shape, plus a separate reflected piece for each of the 6
    * chiral shapes (those whose mirror image is not one of its rotations);
    * lower-cased names mark the reflected twins, as the reference does with
    * capitals. 18 x 5 = 90 cells. */
  val OneSidedShapes: Seq[(String, Seq[(Int, Int)])] = Shapes.flatMap {
    case (name, cells) =>
      // chiral ⟺ the mirror image is not any rotation of the original
      val chiral = !orientations(cells, oneSided = true).contains(reflected(cells))
      if (chiral) Seq(name.toString -> cells, name.toLower.toString -> reflected(cells))
      else Seq(name.toString -> cells)
  }

  /** masksByCell(c) = all (pieceIdx, bitmask) placements whose LOWEST cell is
    * c — with lowest-empty-cell-first search, only these need trying at c. */
  private def placements(width: Int, height: Int): Array[Array[(Int, Long)]] = {
    val byCell = Array.fill(width * height)(List.empty[(Int, Long)])
    for {
      (pi, (_, shape)) <- Shapes.zipWithIndex.map { case (s, i) => (i, s) }
      orient <- orientations(shape)
      r0 <- 0 until height
      c0 <- 0 until width
    } {
      // place the orientation's first (minimal) cell at (r0, c0)
      val (ar, ac) = orient.head
      val abs = orient.map { case (r, c) => (r0 + r - ar, c0 + c - ac) }
      if (abs.forall { case (r, c) => r >= 0 && r < height && c >= 0 && c < width }) {
        val mask = abs.map { case (r, c) => 1L << (r * width + c) }.reduce(_ | _)
        val lowest = java.lang.Long.numberOfTrailingZeros(mask)
        byCell(lowest) ::= (pi, mask)
      }
    }
    byCell.map(_.toArray)
  }

  /** Count of subtree completions from (board, used). `board` has all cells
    * outside the rectangle pre-set; a full board is -1L. */
  private def solve(board: Long, used: Int, byCell: Array[Array[(Int, Long)]]): Long = {
    if (board == -1L) return 1L
    val c = java.lang.Long.numberOfTrailingZeros(~board)
    var count = 0L
    val ps = byCell(c)
    var i = 0
    while (i < ps.length) {
      val (pi, mask) = ps(i)
      if ((used & (1 << pi)) == 0 && (board & mask) == 0L)
        count += solve(board | mask, used | (1 << pi), byCell)
      i += 1
    }
    count
  }

  /** Two-word-board variant for boards of 65..128 cells (the 90-cell
    * one-sided boards don't fit one Long). Same lowest-empty-cell-first
    * search; placements carry (piece, loWord, hiWord) masks.
    *
    * Deliberately a separate copy of the one-Long solver rather than its
    * generalization: the single-word path is the hot one (q47's 6x10 search
    * visits ~100x the nodes of the 3-wide one-sided board) and collapsing it
    * onto two-word ops taxes every node of the deeper search; the inner loop
    * is ~10 lines, and both counts are pinned by independent oracles
    * (9356, 184), so divergence is caught. */
  private def placements2(shapes: Seq[Seq[(Int, Int)]], width: Int, height: Int,
                          oneSided: Boolean): Array[Array[(Int, Long, Long)]] = {
    val byCell = Array.fill(width * height)(List.empty[(Int, Long, Long)])
    for {
      (shape, pi) <- shapes.zipWithIndex
      orient <- orientations(shape, oneSided)
      r0 <- 0 until height
      c0 <- 0 until width
    } {
      val (ar, ac) = orient.head
      val abs = orient.map { case (r, c) => (r0 + r - ar, c0 + c - ac) }
      if (abs.forall { case (r, c) => r >= 0 && r < height && c >= 0 && c < width }) {
        var m0 = 0L; var m1 = 0L
        abs.foreach { case (r, c) =>
          val bit = r * width + c
          if (bit < 64) m0 |= 1L << bit else m1 |= 1L << (bit - 64)
        }
        val lowest = if (m0 != 0L) java.lang.Long.numberOfTrailingZeros(m0)
                     else 64 + java.lang.Long.numberOfTrailingZeros(m1)
        byCell(lowest) ::= (pi, m0, m1)
      }
    }
    byCell.map(_.toArray)
  }

  private def solve2(b0: Long, b1: Long, used: Int,
                     byCell: Array[Array[(Int, Long, Long)]]): Long = {
    if (b0 == -1L && b1 == -1L) return 1L
    val c = if (b0 != -1L) java.lang.Long.numberOfTrailingZeros(~b0)
            else 64 + java.lang.Long.numberOfTrailingZeros(~b1)
    var count = 0L
    val ps = byCell(c)
    var i = 0
    while (i < ps.length) {
      val (pi, m0, m1) = ps(i)
      if ((used & (1 << pi)) == 0 && (b0 & m0) == 0L && (b1 & m1) == 0L)
        count += solve2(b0 | m0, b1 | m1, used | (1 << pi), byCell)
      i += 1
    }
    count
  }

  /** Raw tiling count of a width x height board with the 18 one-sided pieces
    * (reference OneSidedPentomino.java — its main() solves 3x30), fanned out
    * over the first-level placements like `solutionCount`. Board must have
    * exactly 18 x 5 = 90 cells. */
  def oneSidedSolutionCount(spark: SparkSession,
                            width: Int = 30, height: Int = 3): DataFrame = {
    import spark.implicits._
    require(width * height == 90, "18 one-sided pentominoes tile exactly 90 cells")
    val byCell = placements2(OneSidedShapes.map(_._2), width, height, oneSided = true)
    // cells 90-127 pre-set "occupied": full board is (-1L, -1L)
    val b1Init = -1L << (width * height - 64)
    val seeds = byCell(0).toSeq
    val counts = spark.createDataset(seeds)
      .repartition(seeds.size)
      .map { case (pi, m0, m1) => solve2(m0, b1Init | m1, 1 << pi, byCell) }
      .toDF("n")
    import org.apache.spark.sql.functions._
    counts.agg(sum(col("n")).as("n_solutions"),
      lit(width).as("width"), lit(height).as("height"))
  }

  /** Raw tiling count of the width x height board (all 12 pieces), fanned out
    * over the first-level placements. */
  def solutionCount(spark: SparkSession, width: Int = 10, height: Int = 6): DataFrame = {
    import spark.implicits._
    require(width * height == 60, "12 pentominoes tile exactly 60 cells")
    val byCell = placements(width, height)
    val empty = -1L << 60 // cells 60-63 pre-set "occupied"; full board == -1L
    val seeds = byCell(0).toSeq
    val counts = spark.createDataset(seeds)
      .repartition(seeds.size)
      .map { case (pi, mask) => solve(empty | mask, 1 << pi, byCell) }
      .toDF("n")
    import org.apache.spark.sql.functions._
    counts.agg(sum(col("n")).as("n_solutions"),
      lit(width).as("width"), lit(height).as("height"))
  }
}
