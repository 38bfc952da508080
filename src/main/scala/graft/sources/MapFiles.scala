package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MapFile / BloomMapFile point-lookup path (IO/MapFile.java,
  * IO/BloomMapFile.java) re-expressed Spark-first.
  *
  * A MapFile is a key-sorted SequenceFile plus a sparse key index enabling
  * seek-based lookups; BloomMapFile adds a bloom filter to skip files that
  * cannot contain the key. The parquet equivalents are built in:
  *  - `repartitionByRange(key) + sortWithinPartitions(key)` writes files that
  *    each cover a disjoint key range with per-row-group min/max statistics —
  *    the "index";
  *  - a `key = v` filter is pushed into the scan (`PushedFilters` in the
  *    plan), so row groups (and, with range partitioning, whole files) whose
  *    statistics exclude the key are never read — the "seek";
  *  - parquet column indexes / dictionary + bloom filters
  *    (`parquet.bloom.filter.enabled`) are the BloomMapFile analog.
  */
object MapFiles {

  /** Write `df` as a range-partitioned, key-sorted parquet "map file". */
  def write(df: DataFrame, path: String, keyCol: String,
            bloom: Boolean = false): Unit = {
    val w = df.repartitionByRange(col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite)
    (if (bloom) w.option(s"parquet.bloom.filter.enabled#$keyCol", "true") else w)
      .parquet(path)
  }

  /** Point lookup: the equality predicate reaches the parquet scan, pruning
    * non-matching row groups/files via their min/max stats. */
  def lookup(spark: SparkSession, path: String, keyCol: String, value: Any): DataFrame =
    spark.read.parquet(path).filter(col(keyCol) === lit(value))
}
