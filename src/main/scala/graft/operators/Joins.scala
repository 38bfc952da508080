package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** N-ary join operators.
  *
  * Re-expresses the reference's composite map-side join family
  * (hadoop-mapreduce-client-core .../lib/join/CompositeInputFormat.java:39-52 —
  * `compose("inner"|"outer"|"override", fmt, paths...)`,
  * InnerJoinRecordReader.java:34, OuterJoinRecordReader.java:49,
  * OverrideRecordReader.java:42) and the tagged reduce-side join framework
  * (hadoop-tools/hadoop-datajoin .../DataJoinReducerBase.java:174-214).
  *
  * Spark-first: Catalyst picks sort-merge vs broadcast-hash per side (AQE can
  * flip to broadcast at runtime); the reference's "already co-sorted, no
  * shuffle" case corresponds to bucketed tables. At 100 TB: join keys shuffle
  * once; dimension-sized sides should be wrapped in `broadcast(...)` by the
  * caller or left to AQE's size estimate.
  */
object Joins {

  /** n-ary equi-join on a shared key column name. joinType: "inner" | "full_outer" | ... */
  def nary(dfs: Seq[DataFrame], key: String, joinType: String): DataFrame = {
    require(dfs.nonEmpty, "need at least one input")
    // USING-column join: Spark emits a single coalesced key column, matching
    // the reference's TupleWritable-with-one-key shape.
    dfs.reduceLeft((a, b) => a.join(b, Seq(key), joinType))
  }

  def naryInner(dfs: Seq[DataFrame], key: String): DataFrame = nary(dfs, key, "inner")
  def naryOuter(dfs: Seq[DataFrame], key: String): DataFrame = nary(dfs, key, "full_outer")

  /** Priority ("override") join: for each key emit the value from the
    * RIGHT-MOST source that has it. Each input must have columns (key, value).
    * Mirrors OverrideRecordReader.java:42 semantics.
    */
  def overrideJoin(sources: Seq[DataFrame], key: String, value: String): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    val renamed = sources.zipWithIndex.map { case (df, i) =>
      df.select(col(key).as(key), col(value).as(s"__v$i"))
    }
    val joined = renamed.reduceLeft((a, b) => a.join(b, Seq(key), "full_outer"))
    val vcols = sources.indices.reverse.map(i => col(s"__v$i")) // rightmost wins
    joined.select(col(key), coalesce(vcols: _*).as(value))
  }

  /** Tagged reduce-side join (datajoin framework): group both sides by key,
    * hand the per-key value lists to a user `combine` — the generalized form
    * of DataJoinReducerBase.joinAndCollect's per-key cross product. Built on
    * `cogroup`, which co-partitions both sides with a single shuffle each.
    */
  def tagged[K: Encoder, L: Encoder, R: Encoder, OUT: Encoder](
      left: Dataset[L], right: Dataset[R])(
      leftKey: L => K, rightKey: R => K)(
      combine: (K, Iterator[L], Iterator[R]) => IterableOnce[OUT]): Dataset[OUT] =
    left.groupByKey(leftKey).cogroup(right.groupByKey(rightKey))(combine)

  /** As-of (backward) join: for each left row, the single right row with the
    * greatest `rightTime <= leftTime` for the same key (ties broken by the
    * largest `rightTie`). An operator Spark lacks natively — implemented
    * Spark-first as the union+window technique: tag both sides, one window
    * over (key) ordered by (time, right-before-left, tie), carry the last
    * non-null right payload forward. ONE shuffle + sort, linear in
    * |left|+|right| — no range-join blowup, no per-row probes; survives
    * 100 TB because it is exactly a sort-merge pass.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, rightTie: String,
           rightPrefix: String = "r_"): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, rightTie, rightPrefix,
      forward = false)

  /** FORWARD as-of join: for each left row, the single right row with the
    * smallest `rightTime >= leftTime` for the same key (ties broken by the
    * SMALLEST `rightTie`) — the conversion-attribution shape ("first
    * purchase at-or-after this click"). Implemented as [[asOf]] over
    * time-DESCENDING sort order, NOT an unbounded-FOLLOWING window frame:
    * Spark's running-aggregate optimization applies only to
    * [unboundedPreceding, currentRow] frames (an unbounded-following
    * last/first re-scans the frame per row — quadratic per partition), and
    * reversing the sort turns "earliest at-or-after" into "last seen
    * at-or-before" under the same linear machinery. */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String, rightTie: String,
                  rightPrefix: String = "r_"): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, rightTie, rightPrefix,
      forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String, rightTie: String,
                       rightPrefix: String, forward: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StructType
    val rightPayloadCols = right.columns.filterNot(keys.contains)
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields.filter(f => rightPayloadCols.contains(f.name)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__isR"), lit(null).cast("long").as("__tie"),
          struct(left.columns.map(col): _*).as("__l"),
          lit(null).cast(rType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(1).as("__isR"), col(rightTie).cast("long").as("__tie"),
          lit(null).cast(lType).as("__l"),
          struct(rightPayloadCols.map(col): _*).as("__r")): _*)
    // Both directions run the SAME running [unboundedPreceding, currentRow]
    // frame; direction lives entirely in the sort. Backward: time asc,
    // right-before-left at equal time, ties asc so the LARGEST tie is the
    // last seen. Forward: time desc (preceding rows now have time >=
    // left's), right still before left at equal time, ties desc so the
    // SMALLEST tie is the last seen.
    val order =
      if (forward)
        Seq(col("__t").desc, col("__isR").desc, col("__tie").desc_nulls_first)
      else
        Seq(col("__t").asc, col("__isR").desc, col("__tie").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
    joined.select(
      col("__l.*") +: rightPayloadCols.map(c => col(s"__match.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Point-in-interval range join: every left row whose numeric `pointCol`
    * lies in a right row's [loCol, hiCol] (inclusive), with optional extra
    * equi-`keys`. Another operator Spark lacks natively (its planner turns a
    * BETWEEN join condition into BroadcastNestedLoopJoin — O(|L|x|R|) once
    * the right side stops fitting in a broadcast).
    *
    * Spark-first scale form: quantize the domain into buckets of
    * `bucketWidth`; each interval explodes into its covering buckets, each
    * point maps to exactly ONE bucket, and the join becomes a hash equi-join
    * on (keys..., bucket) + exact filter. A matching pair meets in exactly
    * one bucket (the point's), so no dedup pass is needed. Cost is
    * |L| + Σ(interval_length/bucketWidth) — pick `bucketWidth` near the
    * typical interval length so intervals explode into O(1) buckets.
    * Values must be long-castable and |value| < 2^53 (double-exact floor).
    */
  def rangeJoin(left: DataFrame, pointCol: String, right: DataFrame,
                loCol: String, hiCol: String, bucketWidth: Long,
                keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: Column): Column =
      floor(c.cast("long") / lit(bucketWidth.toDouble)).cast("long")
    val lb0 = left.withColumn("__b", bucket(col(pointCol)))
    // The bucket join's OUTPUT can dwarf its input — every point inside a
    // window matches, so |pairs| ≈ |windows| × points-per-window — and the
    // join executes at the POINT side's partitioning (the window side is
    // typically the broadcast side). When the point side arrives in fewer
    // partitions than the session's shuffle parallelism — a single small
    // file at test scale — the entire explosion serializes into those few
    // tasks, and AQE cannot widen it (its coalescing heuristic sees
    // shuffle INPUT bytes; the blowup is in the join's output). Spread the
    // point side by the bucket key first: the EXPLICIT partition count
    // pins the exchange against AQE coalescing, and hashing on __b means
    // a non-broadcast right side co-partitions with no second exchange.
    // The gate is PLANNING-ONLY: optimizer size estimates, never `.rdd`
    // (which materializes the AQE plan — executing every upstream stage a
    // second time — and throws outright on a streaming input). A point
    // side estimated below numShufflePartitions × maxPartitionBytes is
    // at-or-near the size where the scan split rule stops yielding the
    // session's parallelism, and reshuffling it is cheap (bounded by that
    // same product — one pass over at most np×maxPartitionBytes, trivial
    // against the explode it parallelizes, even when bytesPerCore would
    // have split the scan a little wider anyway); anything larger — or
    // unknown, which estimates as huge — already arrives wide and skips
    // the branch, paying nothing at real scale. Declared limitation of
    // estimate-based gating: a DERIVED point side whose true output is
    // tiny but whose estimate is inflated (aggregates/joins estimate
    // from their children) keeps the ungated pre-guard plan — a caller
    // with that shape should `repartition(np, bucket)` explicitly before
    // the join; only runtime (AQE-level) sizes could catch it here, and
    // reading them costs a full second execution of the lineage. Width ≈
    // interval scale keeps per-bucket counts balanced, so bucket-hash
    // spreading is not a new skew surface.
    val conf = left.sparkSession.sessionState.conf
    val np = conf.numShufflePartitions
    val narrow = !lb0.isStreaming &&
      lb0.queryExecution.optimizedPlan.stats.sizeInBytes <
        BigInt(np.toLong) * conf.filesMaxPartitionBytes
    // The explosion materializes on whichever side STREAMS, so the build
    // side must be chosen by blowup, not by the planner's size economics:
    // left to its estimates, Spark happily broadcasts a small 1-column
    // POINT side (BuildLeft), streaming the whole explode through the
    // window side's partitions — which often arrive from an aggregate
    // exchange AQE has coalesced to near-one task (its input-bytes
    // heuristic cannot see output blowup; measured on q56: the 28M-pair
    // explode in ONE task, the point-side repartition swallowed by the
    // broadcast). When the window side fits the session broadcast
    // threshold (pre-explode optimizer estimate — the same planning-only
    // stats family the planner consults; per-interval fan-out is O(1) by
    // the width contract), HINT it broadcast so the point side streams at
    // the width pinned below. A runtime-larger window side costs a bigger
    // broadcast, never wrong rows; a genuinely large one skips the hint
    // and shuffles on (keys..., __b).
    val windowBroadcasts = !right.isStreaming &&
      right.queryExecution.optimizedPlan.stats.sizeInBytes <=
        conf.autoBroadcastJoinThreshold
    // Spread keys: hashing on __b alone caps the achieved parallelism at
    // the number of DISTINCT buckets — a point side whose values fall into
    // fewer buckets than np still serializes the explode into that few
    // tasks. Under the broadcast hint there is no co-partitioning to
    // protect, so spread by (__b, point): near-full fan-out regardless of
    // bucket count. A non-broadcast window side shuffles on
    // (keys..., __b), and only a left exchange on a SUBSET of those keys
    // avoids a second one — keep __b alone there.
    val spread =
      if (windowBroadcasts) Seq(col("__b"), col(pointCol))
      else Seq(col("__b"))
    val lb = if (narrow) lb0.repartition(np, spread: _*) else lb0
    // Inverted intervals (lo > hi) can never match a point, but Spark's
    // `sequence` steps BACKWARD when start > stop — one dirty row with a
    // large inverted span (say a sentinel hi=0) explodes into a huge
    // descending bucket array. Drop such rows (and null bounds — BETWEEN
    // never matches on null) before exploding.
    val rb0 = right.filter(col(loCol) <= col(hiCol)).withColumn("__b",
      explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    val rb = if (windowBroadcasts) broadcast(rb0) else rb0
    lb.join(rb, keys :+ "__b", "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  /** Semi/anti exposure (absent as named ops in the reference — §2.4 note). */
  def semi(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_semi")
  def anti(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_anti")
}
