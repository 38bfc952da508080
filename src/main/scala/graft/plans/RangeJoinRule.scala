package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rewrite for point-in-interval joins — the whole-operator form of
  * `operators/Joins.rangeJoin` (see its scaladoc for the algorithm and the
  * reference mapping).
  *
  * Spark plans `L JOIN R ON l.pt BETWEEN r.lo AND r.hi` (no equi conjunct) as
  * BroadcastNestedLoopJoin — O(|L|·|R|) compares, and a hard failure once R
  * outgrows the broadcast budget. This rule rewrites the join, at the logical
  * level, into the bucketized form: bucket the point on the left, explode
  * each interval into its covering buckets on the right, hash-equi-join on
  * the bucket, and keep the original predicate as the exactness filter. A
  * matching pair meets in exactly one bucket (the point's), so no dedup is
  * needed and row multiplicity is preserved.
  *
  * Opt-in: set `spark.graft.rangeJoin.bucketWidth` to a positive long near
  * the typical interval length (0 = off, the default — a width far from the
  * data's interval scale degrades the explode factor). Applies to INNER joins
  * whose condition has a lower and an upper bound on the same left-side
  * integral expression against right-side integral bounds, and no existing
  * equi conjunct (with one, Catalyst already plans a hash/merge join and the
  * range conjuncts ride along as filters). The rewrite introduces an equi
  * conjunct, so it never re-matches its own output.
  *
  * Register via `GraftExtensions` (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // floor(cast(e as long) / width) — identical to Joins.rangeJoin.bucket,
  // |value| < 2^53 exact under double division.
  private def bucket(e: Expression, width: Long): Expression =
    Cast(Floor(Divide(Cast(Cast(e, LongType), DoubleType),
      Literal(width.toDouble))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Defensive parse: a non-numeric conf value must not throw inside the
    // optimizer (that would fail EVERY query in the session) — warn and
    // treat as disabled.
    val raw = SQLConf.get.getConfString(WidthKey, "0")
    val width = scala.util.Try(raw.trim.toLong).getOrElse {
      logWarning(s"ignoring non-numeric $WidthKey='$raw' (range-join rewrite disabled)")
      0L
    }
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        def leftOnly(e: Expression) =
          e.deterministic && e.references.nonEmpty && e.references.subsetOf(left.outputSet)
        def rightOnly(e: Expression) =
          e.deterministic && e.references.nonEmpty && e.references.subsetOf(right.outputSet)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) => (leftOnly(a) && rightOnly(b)) || (leftOnly(b) && rightOnly(a))
          case EqualNullSafe(a, b) => (leftOnly(a) && rightOnly(b)) || (leftOnly(b) && rightOnly(a))
          case _ => false
        }
        // (pt, bound) pairs, pt on the left: lowers from pt >= lo, uppers from
        // pt <= hi (either comparison orientation).
        val lowers = conjuncts.collect {
          case GreaterThanOrEqual(pt, lo) if leftOnly(pt) && rightOnly(lo) => (pt, lo)
          case LessThanOrEqual(lo, pt) if leftOnly(pt) && rightOnly(lo) => (pt, lo)
        }
        val uppers = conjuncts.collect {
          case LessThanOrEqual(pt, hi) if leftOnly(pt) && rightOnly(hi) => (pt, hi)
          case GreaterThanOrEqual(hi, pt) if leftOnly(pt) && rightOnly(hi) => (pt, hi)
        }
        val pair = (for {
          (pt, lo) <- lowers
          (pt2, hi) <- uppers
          if pt.semanticEquals(pt2) && Seq(pt, lo, hi).forall(isIntegral)
        } yield (pt, lo, hi)).headOption
        pair match {
          case Some((pt, lo, hi)) if !hasEqui =>
            val lb = Alias(bucket(pt, width), "__graft_lb")()
            val newLeft = Project(left.output :+ lb, left)
            val rb = AttributeReference("__graft_rb", LongType, nullable = false)()
            // Sequence is TimeZoneAwareExpression: without an explicit zone it
            // stays unresolved and fails the optimizer's plan validation.
            val seq = Sequence(bucket(lo, width), bucket(hi, width), None,
              Some(SQLConf.get.sessionLocalTimeZone))
            // Inverted intervals (lo > hi — e.g. a sentinel hi=0 on dirty
            // data) can never match, but Sequence steps BACKWARD when
            // start > stop, exploding one bad row into a huge descending
            // array. Guard: emit an empty bucket list instead (null bounds
            // also land here — BETWEEN never matches on null). This rule
            // rewrites arbitrary user BETWEEN joins, so it must never turn a
            // query that plain BNLJ would run into an array-size blowup.
            val guarded = If(
              LessThanOrEqual(Cast(lo, LongType), Cast(hi, LongType)),
              seq,
              Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
            val gen = Generate(
              Explode(guarded),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(rb), child = right)
            val newJoin = Join(newLeft, gen, Inner,
              Some(And(EqualTo(lb.toAttribute, rb), cond)), hint)
            Project(j.output, newJoin)
          case _ => j
        }
    }
  }
}
