package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field-selection projection DSL.
  *
  * Re-expresses the reference's field-selection map/reduce operator
  * (hadoop-mapreduce-client-core .../lib/fieldsel/FieldSelectionHelper.java:30-58,
  * FieldSelectionMapper.java:61): a record is split on a separator into
  * fields; a spec like `"4,3,0,1:6,5,1-3,7-"` selects `keyFields:valueFields`
  * where each element is a single index `n`, a closed range `n-m`, or an open
  * range `n-` (n..last). Selected fields are re-joined with the separator.
  *
  * Spark-first: the spec compiles to pure `Column` expressions
  * (`split`/`element_at`/`slice`/`concat`/`array_join`) — whole-stage
  * codegen'd, no UDFs, fully pushdown/prune friendly.
  */
object FieldSelection {

  sealed trait FieldSpec
  final case class Single(i: Int) extends FieldSpec
  final case class Closed(from: Int, to: Int) extends FieldSpec
  final case class Open(from: Int) extends FieldSpec

  /** Parse one side of the spec ("4,3,0,1-3,7-") into field specs. 0-based. */
  def parseList(spec: String): Seq[FieldSpec] =
    spec.split(",").toSeq.filter(_.nonEmpty).map { tok =>
      if (tok.endsWith("-")) Open(tok.dropRight(1).toInt)
      else if (tok.contains("-")) {
        val Array(a, b) = tok.split("-", 2)
        Closed(a.toInt, b.toInt)
      } else Single(tok.toInt)
    }

  /** Parse full "keySpec:valueSpec" (value part optional). */
  def parse(spec: String): (Seq[FieldSpec], Seq[FieldSpec]) = {
    val idx = spec.indexOf(':')
    if (idx < 0) (parseList(spec), Seq.empty)
    else (parseList(spec.substring(0, idx)), parseList(spec.substring(idx + 1)))
  }

  /** Selected fields of a split-line array, as a flat array column. */
  def selectFields(arr: Column, specs: Seq[FieldSpec]): Column = {
    val parts: Seq[Column] = specs.map {
      // get(), not element_at(i + 1): ANSI mode (Spark 4's default, and this
      // engine's) makes an out-of-bounds element_at THROW, so one ragged
      // line — fewer fields than the spec names — would kill the job where
      // the reference's FieldSelectionHelper just drops the missing field;
      // get() is 0-based and OOB-null-safe, and the filter below drops it
      case Single(i)     => array(get(arr, lit(i)))
      case Closed(a, b)  => slice(arr, a + 1, math.max(b - a + 1, 0))
      case Open(a)       => slice(arr, lit(a + 1), greatest(size(arr) - a, lit(0)))
    }
    val joined = if (parts.isEmpty) array() else concat(parts: _*)
    filter(joined, x => x.isNotNull) // out-of-range singles yield null; drop like the reference
  }

  /** Apply a fieldsel spec to a line column: returns (key, value) string columns. */
  def keyValue(lineCol: Column, separator: String, spec: String): (Column, Column) = {
    val (keySpecs, valSpecs) = parse(spec)
    // split() takes a regex — quote the literal separator.
    val arr = split(lineCol, java.util.regex.Pattern.quote(separator))
    (array_join(selectFields(arr, keySpecs), separator),
     array_join(selectFields(arr, valSpecs), separator))
  }

  /** DataFrame form: project `lineCol` of `df` into key/value columns. */
  def apply(df: DataFrame, lineCol: String, separator: String, spec: String): DataFrame = {
    val (k, v) = keyValue(col(lineCol), separator, spec)
    df.select(k.as("key"), v.as("value"))
  }
}
