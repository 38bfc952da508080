package graft.jobs

import graft.operators.{KeyFieldSort, Pipe}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The hadoop-streaming job facade: `-mapper cmd [-combiner cmd] -reducer cmd`
  * composed as pipe → keyed shuffle → pipe.
  *
  * Re-expresses StreamJob (hadoop-tools/hadoop-streaming .../streaming/
  * StreamJob.java:420-475 argv wiring) and the PipeMapper/PipeReducer line
  * protocol (PipeMapper.java:79-81: mapper output lines are split at
  * `stream.map.output.field.separator` with the first
  * `stream.num.map.output.key.fields` fields as the shuffle key;
  * PipeMapRed.java:214 feeds the reducer `key SEP value` lines, so a line
  * with an empty value carries a trailing separator, exactly as
  * TextOutputFormat writes it).
  *
  * Spark-first shape:
  *  - mapper/combiner/reducer are `Pipe.pipeLines` stages (one subprocess per
  *    partition, feeder thread, stderr inherited);
  *  - the "shuffle" is `repartition(partition-key)` +
  *    `sortWithinPartitions(sort-keys)` — all lines of a key land in one
  *    partition, contiguous and sorted, which is the exact contract a
  *    streaming reducer (e.g. `uniq`, `awk` accumulators) relies on;
  *  - an optional `-k` comparator spec (KeyFieldBasedComparator) compiles via
  *    `KeyFieldSort` into the within-partition sort order;
  *  - `partitionKeyFields` < numKeyFields mirrors KeyFieldBasedPartitioner's
  *    partition-on-key-prefix (all keys sharing the prefix meet in one
  *    reducer, sorted by the full key — the secondary-sort idiom).
  *
  * Scale: both pipes run per-partition with no driver involvement; the only
  * shuffle is the keyed repartition, whose width follows
  * `spark.sql.shuffle.partitions` / AQE exactly like any aggregation.
  */
object StreamJob {

  final case class Spec(
      mapper: Seq[String],
      reducer: Seq[String] = Nil, // Nil ≙ IdentityReducer (sorted keyed lines out)
      combiner: Seq[String] = Nil,
      separator: String = "\t",
      numKeyFields: Int = 1,
      partitionKeyFields: Int = 0, // 0 ≙ numKeyFields
      sortSpec: String = "") // "" ≙ plain ascending full-key sort

  /** Run the streaming job over a dataset of input lines. */
  def run(lines: Dataset[String], spec: Spec): Dataset[String] = {
    val spark = lines.sparkSession
    val mapped = Pipe.pipeLines(lines, spec.mapper)

    val sepQ = java.util.regex.Pattern.quote(spec.separator)
    val fields = split(col("line"), sepQ)
    val keyOf = concat_ws(spec.separator,
      (1 to spec.numKeyFields).map(i => coalesce(get(fields, lit(i - 1)), lit(""))): _*)
    val partFields = if (spec.partitionKeyFields > 0) spec.partitionKeyFields
                     else spec.numKeyFields
    val partKey = concat_ws(spec.separator,
      (1 to partFields).map(i => coalesce(get(fields, lit(i - 1)), lit(""))): _*)
    val valOf = array_join(slice(fields, spec.numKeyFields + 1, 1 << 24), spec.separator)

    // reducer input line = key SEP value (trailing separator when the value
    // is empty — the PipeMapRed wire format)
    val keyed = mapped.toDF("line")
      .select(col("line"), keyOf.as("__key"), partKey.as("__pkey"), valOf.as("__val"))
      .select(concat(col("__key"), lit(spec.separator), col("__val")).as("line"),
        col("__key"), col("__pkey"))

    val combined =
      if (spec.combiner.isEmpty) keyed
      else { // combiner runs on map-side-sorted runs, before the shuffle
        val pre = keyed.sortWithinPartitions(col("__key"))
          .select(col("line")).as(Encoders.STRING)
        val out = Pipe.pipeLines(pre, spec.combiner).toDF("line")
        val f2 = split(col("line"), sepQ)
        out.select(col("line"),
          concat_ws(spec.separator,
            (1 to spec.numKeyFields).map(i => coalesce(get(f2, lit(i - 1)), lit(""))): _*).as("__key"),
          concat_ws(spec.separator,
            (1 to partFields).map(i => coalesce(get(f2, lit(i - 1)), lit(""))): _*).as("__pkey"))
      }

    val sortCols: Seq[Column] =
      if (spec.sortSpec.isEmpty) Seq(col("__key"))
      else KeyFieldSort.sortColumns(split(col("line"), sepQ), KeyFieldSort.parse(spec.sortSpec))
    val shuffled = combined
      .repartition(col("__pkey"))
      .sortWithinPartitions(sortCols: _*)
      .select(col("line")).as(Encoders.STRING)

    if (spec.reducer.isEmpty) shuffled
    else Pipe.pipeLines(shuffled, spec.reducer)
  }

  /** Convenience: run over text files (TextInputFormat's value stream). */
  def runText(spark: SparkSession, inputPath: String, spec: Spec): Dataset[String] =
    run(graft.sources.Sources.text(spark, inputPath)
      .select(col("value")).as(Encoders.STRING), spec)
}
