package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distinct-count and frequency sketches — the bounded-state tier
  * the reference approximates with exact aggregation.
  *
  * The reference's ValueAggregator DSL offers only EXACT UniqValueCount
  * (.../lib/aggregate/UniqValueCount.java:35 — an in-memory TreeMap of every
  * distinct value, capped by dropping data) and exact histogram counts
  * (.../lib/aggregate/ValueHistogram.java:40). Both hold O(distinct) state per
  * group, which is exactly what dies first at 100 TB. This file adds the two
  * classic mergeable fixed-size summaries:
  *
  *  - [[KmvSketch]] — K-minimum-values distinct-count sketch (Bar-Yossef et
  *    al., "Counting distinct elements in a data stream", RANDOM 2002): keep
  *    the k smallest distinct 60-bit hashes; if the k-th smallest is h_k over
  *    the hash range [0, 2^60), the group saw ≈ (k-1)·2^60/h_k distinct
  *    values. State is ≤ k longs per group REGARDLESS of cardinality, and the
  *    union rule (k smallest of the multiset union) is associative and
  *    commutative, so Catalyst's partial/final ObjectHashAggregate split
  *    map-side-combines it like any built-in — the property that makes it
  *    work as a combiner where the reference's TreeMap cannot.
  *  - [[countMin]] / [[countMinEstimate]] — Count-Min frequency sketch
  *    (Cormode & Muthukrishnan, J. Algorithms 2005): a depth×width grid of
  *    counters, cell (d, h_d(key) mod width) summing the key's weight.
  *    A point estimate is the MIN over the depth rows; collisions only ever
  *    ADD, so estimate ≥ true frequency always (one-sided error). The build
  *    is a single map-side-combined aggregation to depth·width cells — at
  *    100 TB the shuffle carries O(d·w) rows per map partition, independent
  *    of key cardinality, where an exact wordcount shuffles O(distinct).
  *
  * Both sketches hash with md5 (not xxhash64) so an oracle can replay the
  * ENTIRE build in SQL — same hashes, same k-smallest, same cells, same
  * estimates — per the replayable-oracle rule used by q25/q27/q59/q60.
  */
object Sketches {

  /** 60-bit uniform hash: first 15 md5 hex chars as a non-negative long.
    * DuckDB replay: `CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** K-minimum-values sketch over a pre-hashed long column. The buffer and
    * result are the sorted array of the ≤ k smallest DISTINCT hash values.
    *
    * The estimate is intentionally NOT computed here: [[kmvEstimate]] derives
    * it in Catalyst column space so the one floating division lives in SQL
    * functions an oracle replays bit-identically.
    */
  final class KmvSketch(val k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    /** Insert one hash: sorted-unique, bounded at k. O(log k) search +
      * O(k) copy only when the value actually enters the sketch; values
      * above the current k-th smallest are rejected in O(log k). */
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) b // already present
      else {
        val ins = -pos - 1
        if (b.length >= k && ins >= k) b // not among the k smallest
        else {
          val outLen = math.min(b.length + 1, k)
          val out = new Array[Long](outLen)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, outLen - ins - 1)
          out
        }
      }
    }

    /** Union = k smallest of the distinct union of two sorted arrays. */
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      val out = new Array[Long](math.min(b1.length + b2.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < b1.length || j < b2.length)) {
        val take =
          if (i >= b1.length) { val v = b2(j); j += 1; v }
          else if (j >= b2.length) { val v = b1(i); i += 1; v }
          else if (b1(i) < b2(j)) { val v = b1(i); i += 1; v }
          else if (b2(j) < b1(i)) { val v = b2(j); j += 1; v }
          else { val v = b1(i); i += 1; j += 1; v } // equal: emit once
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** The KMV aggregator as a DataFrame aggregate column over a hash column
    * produced by [[hash60]]. Stays inside Catalyst's partial/final agg split
    * (ObjectHashAggregate), so the k-long state is map-side combined. */
  def kmv(k: Int)(hashCol: Column): Column =
    udaf(new KmvSketch(k), Encoders.scalaLong).apply(hashCol)

  /** Distinct-count estimate from a KMV k-smallest array: exact size when the
    * sketch never filled (size < k — every distinct hash is present), else
    * (k-1)·2^60/h_k. `round(_, 6)` per the cross-engine float rule; the
    * product (k-1)·2^60 is exactly representable for any k ≤ 2^12, so the
    * single division is the only rounding step and replays bit-identically.
    *
    * DuckDB replay:
    * `CASE WHEN n < k THEN round(CAST(n AS DOUBLE), 6)
    *       ELSE round((k-1) * power(2.0, 60.0) / h_k, 6) END`. */
  def kmvEstimate(kminArr: Column, k: Int): Column =
    round(
      when(size(kminArr) < k, size(kminArr).cast("double"))
        .otherwise(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
          element_at(kminArr, k)),
      6)

  /** The d-th row's bucket for a key: md5-family hash of `"<d>:<key>"` mod
    * width. DuckDB replay: the same concat + md5 + mod. */
  def cmBucket(d: Int, key: Column, width: Int): Column =
    pmod(hash60(concat_ws(":", lit(d.toString), key.cast("string"))), lit(width.toLong))

  /** Build a depth×width Count-Min sketch from raw rows: one output row per
    * non-empty cell — `(depth, bucket, cnt)`. ONE pass, map-side combined to
    * ≤ depth·width cells per map partition before the shuffle. */
  def countMin(df: DataFrame, key: Column, weight: Column,
               depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth/width >= 1, got $depth x $width")
    val cells = (0 until depth).map { d =>
      struct(lit(d).as("depth"), cmBucket(d, key, width).as("bucket"))
    }
    df.select(explode(array(cells: _*)).as("cell"), weight.cast("long").as("w"))
      .groupBy(col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
      .agg(sum("w").as("cnt"))
  }

  /** Point-estimate the frequency of each probe key against a built sketch:
    * min over the depth rows of the key's cell, 0 for a never-touched cell.
    * The sketch is ≤ depth·width rows, so the join broadcasts; the probe set
    * streams through map-side. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, key: Column,
                       depth: Int, width: Int): DataFrame = {
    val keyed = probes.select(key.as("cm_key")).distinct()
      .select(col("cm_key"), explode(array((0 until depth).map { d =>
        struct(lit(d).as("depth"), cmBucket(d, col("cm_key"), width).as("bucket"))
      }: _*)).as("cell"))
      .select(col("cm_key"), col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
    keyed.join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy("cm_key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** Equi-width histogram quantile sketch: bin = floor(value·scale), per-bin
    * counts (map-side combined, state = touched bins regardless of row
    * count), quantile(p) ≈ upper edge of the first bin whose cumulative
    * count reaches ceil(p·N) — error ≤ 1/scale by construction. The
    * reference computes medians by holding and sorting whole value lists
    * (WordMedian's reducer); bin counts are the bounded-state mergeable
    * form. floor/ceil are engine-exact (unlike round's half-way modes), and
    * ceil(p·N) and bin/scale are one IEEE op each, so the whole sketch
    * replays bit-identically in SQL.
    *
    * Output: one row per group — `n` plus one `q_<tag>` column per prob. */
  def histogramQuantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                         scale: Int, probs: Seq[(String, Double)]): DataFrame = {
    require(scale >= 1 && probs.nonEmpty, "need scale >= 1 and at least one prob")
    val g = groupCols.map(col)
    val bins = df
      .groupBy(g :+ floor(value * lit(scale)).cast("long").as("bin"): _*)
      .agg(count(lit(1)).as("bin_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy("bin")
    val cum = bins
      .withColumn("cum", sum("bin_cnt").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("total", sum("bin_cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)))
    val quantCols = probs.map { case (tag, p) =>
      // first bin whose cumulative count reaches the rank target; the bin's
      // UPPER edge (bin+1)/scale so the true quantile is <= the estimate
      ((min(when(col("cum") >= ceil(lit(p) * col("total")), col("bin"))) + lit(1L))
        .cast("double") / lit(scale.toDouble)).as(s"q_$tag")
    }
    cum.groupBy(g: _*)
      .agg(max(col("total")).as("n"), quantCols: _*)
      .orderBy(g: _*)
  }
}
