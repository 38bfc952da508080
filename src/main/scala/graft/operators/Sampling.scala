package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-sampling filters.
  *
  * Re-expresses SequenceFileInputFilter's three filter classes
  * (hadoop-mapreduce-client-core .../lib/input/SequenceFileInputFilter.java:
  * RegexFilter :111, PercentFilter :154, MD5Filter :203) plus InputSampler's
  * strategies (.../lib/partition/InputSampler.java:97-249) as pure column
  * predicates / built-in sampling — all pushdown-friendly, no extra pass.
  */
object Sampling {

  /** RegexFilter: keep records whose key matches the pattern. */
  def regexFilter(df: DataFrame, keyCol: Column, pattern: String): DataFrame =
    df.filter(regexp_like(keyCol, lit(pattern)))

  /** MD5Filter: keep records where md5(key) mod frequency == 0 — the
    * deterministic, engine-portable 1/f sample (same rows every run and in
    * any engine that computes standard MD5). */
  def md5Filter(df: DataFrame, keyCol: Column, frequency: Int): DataFrame =
    df.filter(md5HashBucket(keyCol, frequency) === 0)

  /** md5(key) reduced mod `frequency` (first 8 hex digits, like the
    * reference's MD5Filter digest-prefix trick). */
  def md5HashBucket(keyCol: Column, frequency: Int): Column =
    pmod(conv(substring(md5(keyCol.cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(frequency.toLong))

  /** PercentFilter ≙ hash-mod sampling on record order isn't reproducible in
    * Spark (no stable record index); the honest equivalents are md5Filter
    * (content-deterministic) or Bernoulli sampling: */
  def bernoulliSample(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** InputSampler.RandomSampler ≙ reservoir-style key sampling for range
    * partitioning — built into Spark's orderBy; exposed here as explicit
    * split-point computation for diagnostic use. */
  def splitPoints(df: DataFrame, keyCol: String, numPartitions: Int): Array[Double] =
    df.stat.approxQuantile(keyCol,
      (1 until numPartitions).map(_.toDouble / numPartitions).toArray, 0.01)
}
