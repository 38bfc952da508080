package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation — the ingest gate a production pipeline runs
  * before a batch is allowed into the corpus (the role Deequ/Great
  * Expectations play; re-derived here as pure DataFrame aggregation, no
  * extra dependency). A suite of declared constraints is evaluated into one
  * small report table: (check_name, target, violations, status).
  *
  * Scale shape — the property that matters at 100 TB ingest:
  *  - ALL row-local constraints (not-null, bounds, accepted-values, custom
  *    predicate, row-count) fold into ONE aggregate over ONE scan of the
  *    table, however many are declared — each is a `sum(when(violated,1))`
  *    column in the same agg, map-side combined.
  *  - `Unique` adds one hash shuffle on its key columns (count>1 groups).
  *  - `ForeignKey` adds one left-anti join against the reference keys
  *    (broadcast when the reference is a dimension; null FKs are NOT
  *    violations — declare NotNull separately to reject them, matching SQL
  *    FK semantics).
  * The report itself is O(#constraints) rows — safe to collect, log, or
  * gate a job on.
  *
  * Reference behavior being covered: the validation half of the reference's
  * job-input sanity checks (input-format record validation, DBInput bounds
  * checking) generalized to declarative table contracts.
  */
object Contracts {

  sealed trait Constraint
  /** violations = rows where `column` IS NULL. */
  final case class NotNull(column: String) extends Constraint
  /** violations = non-null rows outside [lo, hi] (inclusive). Nulls pass —
    * pair with [[NotNull]] to reject them. */
  final case class Bounds(column: String, lo: Double, hi: Double) extends Constraint
  /** violations = non-null rows whose value is not in `values` (literals
    * of any type comparable to the column — strings, numbers, booleans). */
  final case class AcceptedValues(column: String, values: Seq[Any]) extends Constraint
  /** violations = rows where `predicate` is false or null — an arbitrary
    * row-local boolean expression (cross-column rules live here). */
  final case class Satisfies(name: String, predicate: Column) extends Constraint
  /** violations = how many rows short of `min` the table is. */
  final case class RowCountMin(min: Long) extends Constraint
  /** violations = number of EXTRA rows beyond one per distinct key. */
  final case class Unique(columns: Seq[String]) extends Constraint
  /** violations = non-null `column` values with no match in `ref.refColumn`.
    * (Row-level count: three dangling rows with one bad key = three.) */
  final case class ForeignKey(column: String, ref: DataFrame, refColumn: String,
                              refName: String) extends Constraint

  /** (check_name, target, violation-count aggregate) for the one-scan
    * tier — the row-local constraints that fold into a single aggregate. */
  private def scanTier(constraints: Seq[Constraint]): Seq[(String, String, Column)] =
    constraints.flatMap {
      case NotNull(c) =>
        Some(("not_null", c, sum(when(col(c).isNull, 1L).otherwise(0L))))
      case Bounds(c, lo, hi) =>
        Some(("bounds", s"$c in [$lo,$hi]",
          sum(when(col(c).isNotNull &&
            (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L))))
      case AcceptedValues(c, vs) =>
        Some(("accepted_values", c,
          sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))))
      case Satisfies(name, p) =>
        Some(("satisfies", name,
          sum(when(coalesce(p, lit(false)), 0L).otherwise(1L))))
      case RowCountMin(n) =>
        Some(("row_count_min", s">=$n",
          greatest(lit(0L), lit(n) - count(lit(1)))))
      case _ => None
    }

  /** One multi-column aggregate + unpivot → one report row per scan-tier
    * constraint. Works unchanged on a streaming frame (a global
    * aggregation whose state is a single row of counters). */
  private def scanReportDf(df: DataFrame,
                           scan: Seq[(String, String, Column)]): DataFrame = {
    val agg = df.agg(scan.head._3.as("c0"),
      scan.tail.zipWithIndex.map { case ((_, _, a), i) => a.as(s"c${i + 1}") }: _*)
    // unpivot the single agg row into one report row per constraint; the
    // coalesce makes an EMPTY batch report 0 violations for the sum-shaped
    // checks (SQL sums over zero rows are NULL) — row_count_min still
    // fails with its exact shortfall because count() is never null
    val rows = scan.zipWithIndex.map { case ((name, target, _), i) =>
      struct(lit(name).as("check_name"), lit(target).as("target"),
        coalesce(col(s"c$i"), lit(0L)).cast("long").as("violations"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  private def withStatus(report: DataFrame): DataFrame =
    report.select(col("check_name"), col("target"), col("violations"),
      when(col("violations") === 0L, lit("pass")).otherwise(lit("fail"))
        .as("status"))

  /** Evaluate `constraints` against `df` → (check_name, target, violations,
    * status) with one row per constraint, status = pass iff violations = 0.
    * Row-local constraints share a single scan (see object doc). */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty contract suite")
    val scan = scanTier(constraints)
    val scanReport: Option[DataFrame] =
      if (scan.isEmpty) None else Some(scanReportDf(df, scan))

    val grouped: Seq[DataFrame] = constraints.collect {
      case Unique(cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1L), lit(0L)).cast("long").as("violations"))
          .select(lit("unique").as("check_name"),
            lit(cols.mkString(",")).as("target"), col("violations"))
      case ForeignKey(c, ref, rc, refName) =>
        df.select(col(c).as("__k")).filter(col("__k").isNotNull)
          .join(ref.select(col(rc).as("__k")).distinct(), Seq("__k"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("foreign_key").as("check_name"),
            lit(s"$c->$refName.$rc").as("target"), col("violations"))
    }

    withStatus((scanReport.toSeq ++ grouped).reduce(_ unionByName _))
  }

  /** The contract gate IN-FLIGHT: the row-local tier evaluated on a
    * STREAMING frame — the same report, recomputed per micro-batch as a
    * complete-mode global aggregation whose entire state is one row of
    * violation counters (bounded at any ingest volume). `Unique` and
    * `ForeignKey` need cross-batch state or a reference join and stay
    * batch-side (run them per-batch in `foreachBatch` if needed) — a suite
    * containing them is rejected loudly rather than silently dropped. */
  def checkStream(stream: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty contract suite")
    val scan = scanTier(constraints)
    require(scan.size == constraints.size,
      "checkStream supports only row-local constraints (not-null / bounds / " +
        "accepted-values / satisfies / row-count); run Unique/ForeignKey " +
        "batch-side or per-batch via foreachBatch")
    withStatus(scanReportDf(stream, scan))
  }
}
