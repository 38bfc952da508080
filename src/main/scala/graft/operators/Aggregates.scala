package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative aggregation DSL + ValueHistogram.
  *
  * Re-expresses the reference's value-aggregator framework
  * (hadoop-mapreduce-client-core .../lib/aggregate/ValueAggregatorBaseDescriptor.java:39-53
  * name→aggregator registry; LongValueSum/DoubleValueSum/LongValueMax/Min/
  * StringValueMax/Min/UniqValueCount/ValueHistogram) as a name→Column registry
  * driving one `groupBy().agg(...)`. Catalyst's partial/final HashAggregate
  * split IS the reference's combiner/reducer split — map-side partial
  * aggregation is automatic.
  *
  * Scale note: `UniqValueCount` is exact `count(distinct)` (a second shuffle);
  * `ApproxUniqValueCount` is the 100 TB-friendly HLL variant (single pass,
  * mergeable sketches, no extra shuffle).
  */
object Aggregates {

  /** Default cap for CappedUniqValueCount (reference default maxNumItems). */
  val UniqCap: Int = 100

  /** Registry: aggregator name → (value column → aggregate Column). */
  val registry: Map[String, Column => Column] = Map(
    "LongValueSum"         -> (c => sum(c.cast("long"))),
    "DoubleValueSum"       -> (c => sum(c.cast("double"))),
    "LongValueMax"         -> (c => max(c.cast("long"))),
    "LongValueMin"         -> (c => min(c.cast("long"))),
    "StringValueMax"       -> (c => max(c.cast("string"))),
    "StringValueMin"       -> (c => min(c.cast("string"))),
    "UniqValueCount"       -> (c => countDistinct(c)),
    // the reference's UniqValueCount maxNumItems cap (ValueAggregator DSL
    // .../lib/aggregate/UniqValueCount.java:35): report at most `cap`
    "CappedUniqValueCount" -> (c => least(countDistinct(c), lit(UniqCap.toLong))),
    "ApproxUniqValueCount" -> (c => approx_count_distinct(c)),
    "ValueCount"           -> (c => count(c))
  )

  final case class AggSpec(func: String, column: Column, alias: String)
  def spec(func: String, column: Column, alias: String): AggSpec = AggSpec(func, column, alias)

  /** One groupBy().agg() from a list of named aggregator specs.
    *
    * `plugins` are caller-supplied aggregators merged OVER the built-in
    * registry (a plugin may also shadow a built-in name) — the Spark form of
    * the reference's user-defined descriptors, which are loaded by class name
    * from job config (.../lib/aggregate/UserDefinedValueAggregatorDescriptor
    * .java:41) and resolved through the same name→aggregator lookup as the
    * built-ins. A plugin is an ordinary `Column => Column` returning an
    * aggregate expression, so it stays inside Catalyst's partial/final
    * HashAggregate split (map-side combined) like every built-in. */
  def aggregate(df: DataFrame, groupCols: Seq[Column], specs: Seq[AggSpec],
                plugins: Map[String, Column => Column] = Map.empty): DataFrame = {
    require(specs.nonEmpty, "need at least one aggregation spec")
    val resolved = registry ++ plugins
    val exprs = specs.map { s =>
      val fn = resolved.getOrElse(s.func,
        throw new IllegalArgumentException(
          s"unknown aggregator: ${s.func} (known: ${resolved.keys.toSeq.sorted.mkString(", ")})"))
      fn(s.column).as(s.alias)
    }
    df.groupBy(groupCols: _*).agg(exprs.head, exprs.tail: _*)
  }

  /** ValueHistogram (.../lib/aggregate/ValueHistogram.java:52-120): per group,
    * build value→count, then report stats OF THE COUNTS: distinct-value
    * count, min, max, mean, median, stddev(population). Two hash aggregations,
    * both map-side-combined; no UDAF needed.
    */
  def valueHistogram(df: DataFrame, groupCol: Column, valueCol: Column,
                     groupAlias: String = "group"): DataFrame = {
    val counts = df.groupBy(groupCol.as(groupAlias), valueCol.as("__value"))
      .agg(count(lit(1)).as("__cnt"))
    counts.groupBy(col(groupAlias)).agg(
      count(lit(1)).as("n_values"),
      min(col("__cnt")).as("min_cnt"),
      max(col("__cnt")).as("max_cnt"),
      avg(col("__cnt")).as("avg_cnt"),
      median(col("__cnt")).as("median_cnt"),
      stddev_pop(col("__cnt")).as("stddev_cnt"))
  }
}
