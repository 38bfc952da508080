package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sinks — the reference's output-format family over `df.write`.
  *
  * Mappings (SURVEY §2.2):
  *  - TextOutputFormat (key TAB value lines)       → csv with tab separator
  *  - MultipleTextOutputFormat / MultipleOutputs   → `partitionBy` dynamic partitioning
  *  - NullOutputFormat                             → `format("noop")`
  *  - DBOutputFormat                               → `write.jdbc`
  *  - FileOutputCommitter / ManifestCommitter      → built-in (Spark drives Hadoop committers)
  *
  * Scale notes: partitioned writes should be preceded by
  * `repartition(partitionCols)` so each task writes few files (no
  * small-file explosion at 1000 executors); `maxRecordsPerFile` caps runaway
  * partitions.
  */
object Sinks {

  /** TextOutputFormat: `key<TAB>value` lines. */
  def keyValueText(df: DataFrame, path: String, separator: String = "\t"): Unit =
    df.select(concat_ws(separator, df.columns.map(col): _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** Dynamic-partitioned parquet (MultipleOutputs / MultipleTextOutputFormat):
    * one directory per distinct partition value.
    *
    * Repartitioning on the partition columns ALONE collapses parallelism to
    * the partition-value cardinality (3 writers for a 3-value column — at
    * 100 TB that's 3 tasks writing the whole table). Instead the shuffle key
    * is (partitionCols, spread) where spread fans each value over up to
    * `numWriteTasks` writers: full write parallelism, while files-per-dir
    * stays bounded by numWriteTasks (no small-file explosion). The explicit
    * partition count keeps AQE from re-coalescing the write stage. */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         numWriteTasks: Int = 32): Unit = {
    val spread = pmod(xxhash64(struct(df.columns.map(col): _*)), lit(numWriteTasks))
    df.repartition(numWriteTasks, partitionCols.map(col) :+ spread: _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** MultipleOutputs named side outputs (.../lib/output/MultipleOutputs.java:187):
    * several independently-shaped outputs from ONE computed input. The input
    * should be cached/checkpointed by the caller if expensive — each named
    * output is a separate write of a derived frame. */
  def multipleOutputs(df: DataFrame,
                      outputs: Map[String, (DataFrame => DataFrame, String)]): Unit =
    outputs.foreach { case (_, (derive, path)) =>
      derive(df).write.mode(SaveMode.Overwrite).parquet(path)
    }

  /** Discard sink (NullOutputFormat) — runs the plan, writes nothing. */
  def noop(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).format("noop").save()

  /** JDBC sink (DBOutputFormat). */
  def jdbc(df: DataFrame, url: String, table: String,
           props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
}
