package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unix-`sort`-style key-field ordering.
  *
  * Re-expresses the reference's KeyFieldBasedComparator / KeyFieldBasedPartitioner
  * (hadoop-mapreduce-client-core .../lib/partition/KeyFieldBasedComparator.java:36-50,
  * KeyFieldHelper.java): a spec like `-k2,2nr -k1,1` orders split-line records
  * by field 2 numerically descending, then field 1 lexicographically.
  *
  * Spark-first: the spec compiles to `Seq[Column]` sort expressions fed to
  * `orderBy` — Catalyst plans a sampled RangePartitioning global sort (the
  * moral equivalent of TotalOrderPartitioner, minus the manual sampling job).
  * Fields are 1-based as in `sort(1)`.
  */
object KeyFieldSort {

  final case class KeySpec(field: Int, numeric: Boolean, reverse: Boolean)

  private val KeyPat = """-k(\d+)(?:\.\d+)?(?:,(\d+)(?:\.\d+)?)?([nr]*)""".r

  def parse(spec: String): Seq[KeySpec] =
    spec.trim.split("\\s+").toSeq.filter(_.nonEmpty).map {
      case KeyPat(f, _, opts) =>
        KeySpec(f.toInt, numeric = opts.contains('n'), reverse = opts.contains('r'))
      case other => throw new IllegalArgumentException(s"bad key spec token: $other")
    }

  /** Sort expressions over a split-line array column. A line with fewer
    * fields than the spec sorts as NULL / empty (the reference comparator's
    * missing-field behavior) — `get` is OOB-null-safe where `element_at`
    * would throw under Spark 4 ANSI mode. A NON-NUMERIC field under a
    * numeric (`n`) key sorts as null too (`try_cast`): a plain cast under
    * ANSI aborts the whole sort on the first garbage line, where sort(1)
    * and the reference comparator just order it degenerately — nulls
    * group with the missing fields, first ascending / last descending. */
  def sortColumns(arr: Column, keys: Seq[KeySpec]): Seq[Column] =
    keys.map { k =>
      val f = get(arr, lit(k.field - 1))
      val typed = if (k.numeric) f.try_cast("double") else coalesce(f, lit(""))
      if (k.reverse) typed.desc_nulls_last else typed.asc_nulls_first
    }

  /** Globally sort a single-string-column DataFrame of lines by the spec. */
  def sortLines(df: DataFrame, lineCol: String, separator: String, spec: String): DataFrame = {
    val arr = split(col(lineCol), java.util.regex.Pattern.quote(separator))
    df.orderBy(sortColumns(arr, parse(spec)): _*)
  }

  /** Partition expressions for a spec — the KeyFieldBasedPartitioner side
    * (CORE/mapreduce/lib/partition/KeyFieldBasedPartitioner.java:51): rows
    * are co-located by the named fields' VALUES (numeric/reverse flags only
    * affect ordering, not partitioning). */
  def partitionColumns(arr: Column, keys: Seq[KeySpec]): Seq[Column] =
    keys.map(k => coalesce(get(arr, lit(k.field - 1)), lit("")))

  /** The full MapReduce contract `-partitioner KeyFieldBasedPartitioner
    * -k partSpec` + comparator sortSpec: co-locate by the partition fields,
    * order each partition by the (usually longer) sort spec — the
    * secondary-sort idiom over text lines. */
  def partitionAndSortLines(df: DataFrame, lineCol: String, separator: String,
                            partSpec: String, sortSpec: String): DataFrame = {
    val arr = split(col(lineCol), java.util.regex.Pattern.quote(separator))
    df.repartition(partitionColumns(arr, parse(partSpec)): _*)
      .sortWithinPartitions(sortColumns(arr, parse(sortSpec)): _*)
  }
}
