package graft.bench

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalized sort validator (≙ the reference's self-validating jobs:
  * JCT/mapred/SortValidator.java:97-183 proves order + permutation via
  * order-independent record checksums; EX/terasort/TeraValidate.java:88-140).
  *
  * Permutation proof: an order-independent pair of aggregates (count + sum of
  * per-row xxhash64 over all columns) must match between input and output —
  * one pass over each, no join. Order proof: per-partition monotonicity +
  * cross-partition boundary check via one small aggregation per partition.
  */
object SortValidator {

  private def contentChecksum(df: DataFrame): (Long, String, String) = {
    // xor (the reference's checksum) + decimal sum (overflow-free under ANSI)
    val r = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("x"),
        sum(col("h").cast("decimal(38,0)")).as("s"))
      .collect().head
    (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2)))
  }

  /** True iff `output` is a permutation of `input` (same multiset of rows,
    * up to xxhash64 collision odds) — order-independent, two scans total. */
  def isPermutation(input: DataFrame, output: DataFrame): Boolean =
    contentChecksum(input) == contentChecksum(output)

  /** Elementwise natural-order comparison of key rows (standard orderable
    * types; nulls first, like Spark's asc_nulls_first). */
  private[bench] def compareKeys(a: Seq[Any], b: Seq[Any]): Int = {
    a.zip(b).foreach { case (x, y) =>
      val c = (x, y) match {
        case (null, null) => 0
        case (null, _) => -1
        case (_, null) => 1
        case (p: Comparable[_], q) =>
          p.asInstanceOf[Comparable[Any]].compareTo(q)
        case _ => throw new IllegalArgumentException(s"not orderable: $x")
      }
      if (c != 0) return c
    }
    0
  }

  /** True iff `sorted` is globally ordered by `keys` ascending: ONE pass,
    * no shuffle — each partition reports (sorted?, first, last), the driver
    * checks partition boundaries (exactly TeraValidate's protocol). */
  def isGloballySorted(sorted: DataFrame, keys: Seq[String]): Boolean = {
    implicit val enc = org.apache.spark.sql.Encoders
      .kryo[(Boolean, Seq[Any], Seq[Any])]
    val perPart = sorted.select(keys.map(col): _*)
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          var first: Seq[Any] = null
          var prev: Seq[Any] = null
          var ok = true
          it.foreach { r =>
            val k = r.toSeq
            if (first == null) first = k
            if (prev != null && compareKeys(prev, k) > 0) ok = false
            prev = k
          }
          Iterator((ok, first, prev))
        }
      }
      .collect()
    perPart.forall(_._1) && perPart.sliding(2).forall {
      case Array(a, b) => compareKeys(a._3, b._2) <= 0
      case _ => true
    }
  }
}
