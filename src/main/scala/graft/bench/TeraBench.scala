package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TeraGen / TeraSort / MRBench equivalents (BASELINE.md engine-side plan).
  *
  * Mirrors the reference harness's metric shape (wall-clock per phase):
  *  - teraGen ≙ TeraGen (EX/terasort/TeraGen.java:313-320): see
  *    GenSortParity.teraGen — gensort-bit-compatible 100-byte records
  *    (10-byte key + 90-byte payload, EX/terasort/TeraInputFormat.java:60-62).
  *  - teraSort ≙ TeraSort (EX/terasort/TeraSort.java:55): `orderBy` on the
  *    binary key — Spark RangePartitioning samples split points exactly like
  *    TotalOrderPartitioner+InputSampler, then per-partition sort.
  *  - validate ≙ TeraValidate (EX/terasort/TeraValidate.java:88-140):
  *    per-partition ordered-check + boundary order + row checksum, as one
  *    aggregation over the sorted output.
  *  - microJobLoop ≙ MRBench (JCT/mapred/MRBench.java:192-239): N tiny
  *    read→shuffle→aggregate jobs; avg/min/max latency.
  */
object TeraBench {

  /** Row checksum (≙ TeraGen's CRC32 sum counter): sum of crc32(key||value). */
  def checksum(df: DataFrame): Long =
    df.select(sum(crc32(concat(col("key"), col("value")))).as("s"))
      .collect().head.getLong(0)

  def teraSort(df: DataFrame): DataFrame = df.orderBy(col("key"))

  /** TeraValidate: proves global order + permutation via one pass over the
    * sorted data: per-partition (min, max, is_sorted, count, checksum), then
    * driver-side boundary check. Returns (rows, checksum, ordered). */
  def validate(sorted: DataFrame): (Long, Long, Boolean) = {
    import org.apache.spark.sql.Row
    val perPart = sorted.select(col("key"), crc32(concat(col("key"), col("value"))).as("crc"))
      .mapPartitions { it: Iterator[Row] =>
        if (it.isEmpty) Iterator.empty
        else {
          var first: Array[Byte] = null
          var prev: Array[Byte] = null
          var sorted = true
          var n = 0L
          var crc = 0L
          it.foreach { r =>
            val k = r.getAs[Array[Byte]](0)
            if (first == null) first = k
            if (prev != null && java.util.Arrays.compareUnsigned(prev, k) > 0) sorted = false
            prev = k
            n += 1
            crc += r.getLong(1)
          }
          Iterator((first, prev, sorted, n, crc))
        }
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.BINARY, org.apache.spark.sql.Encoders.BINARY,
        org.apache.spark.sql.Encoders.scalaBoolean, org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect()
    val boundariesOk = perPart.sliding(2).forall {
      case Array(a, b) => java.util.Arrays.compareUnsigned(a._2, b._1) <= 0
      case _ => true
    }
    (perPart.map(_._4).sum, perPart.map(_._5).sum,
      perPart.forall(_._3) && boundariesOk)
  }

  /** MRBench-alike: run `runs` tiny shuffle jobs, return (avg, min, max) secs. */
  /** MRBench input orders (JCT/mapred/MRBench.java:305-341 Order.{ASCENDING,
    * DESCENDING, RANDOM}): the generated line stream arrives sorted,
    * reverse-sorted, or hash-scrambled — exercising the shuffle's
    * pre-sortedness sensitivity exactly as the reference's generator does. */
  def microInput(spark: SparkSession, inputLines: Long, order: String): DataFrame = {
    val ids = spark.range(inputLines)
    val ordered = order match {
      case "asc"    => ids.select(col("id"))
      case "desc"   => ids.select((lit(inputLines - 1) - col("id")).as("id"))
      case "random" => ids.select(col("id")).orderBy(xxhash64(col("id")))
      case other    => throw new IllegalArgumentException(s"order: $other")
    }
    ordered.select(lpad(col("id").cast("string"), 10, "0").as("line"))
  }

  def microJobLoop(spark: SparkSession, runs: Int, inputLines: Long,
                   order: String = "asc"): (Double, Double, Double) = {
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      microInput(spark, inputLines, order)
        .groupBy(substring(col("line"), 1, 6).as("k")).agg(count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    (times.sum / runs, times.min, times.max)
  }
}
