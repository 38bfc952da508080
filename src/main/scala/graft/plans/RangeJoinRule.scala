package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Generate, HintInfo, Join, LogicalPlan, Project, RepartitionByExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, ByteType, DateType, DoubleType, IntegerType, LongType, ShortType, TimestampType}

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
  * expression against right-side bounds, and no existing equi conjunct (with
  * one, Catalyst already plans a hash/merge join and the range conjuncts ride
  * along as filters). The rewrite introduces an equi conjunct, so it never
  * re-matches its own output.
  *
  * Supported point/bound types: the integral family, DateType, and
  * TimestampType — point and bounds must come from the SAME family (the
  * analyzer's comparison coercion normally guarantees this). Dates and
  * timestamps are reinterpreted via `unix_date` / `unix_micros` (pure
  * physical-value reads, no timezone arithmetic), so `bucketWidth` is in the
  * column's physical unit: 1s for integrals, DAYS for dates, MICROSECONDS
  * for timestamps (e.g. 30 for month-ish date windows,
  * 86400000000L * 30 for the same over timestamps).
  *
  * Register via `GraftExtensions` (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  // Type family of a candidate point/bound: 'i' integral, 'd' date,
  // 't' timestamp; point and both bounds must agree (mixing days with micros
  // would bucket in different units).
  private def family(e: Expression): Option[Char] = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => Some('i')
    case DateType => Some('d')
    case TimestampType => Some('t')
    case _ => None
  }

  // The physical value as a long: integrals cast, dates as epoch days
  // (unix_date), timestamps as epoch micros (unix_micros) — reinterpretations,
  // not timezone arithmetic, so bucketing is deterministic across sessions.
  private def toLong(e: Expression): Expression = e.dataType match {
    case DateType => Cast(UnixDate(e), LongType)
    case TimestampType => UnixMicros(e)
    case _ => Cast(e, LongType)
  }

  // floor(toLong(e) / width) — identical to Joins.rangeJoin.bucket,
  // |value| < 2^53 exact under double division.
  private def bucket(e: Expression, width: Long): Expression =
    Cast(Floor(Divide(Cast(toLong(e), DoubleType),
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
          fam <- family(pt).toSeq
          if pt.semanticEquals(pt2) &&
            family(lo).contains(fam) && family(hi).contains(fam)
        } yield (pt, lo, hi)).headOption
        pair match {
          case Some((pt, lo, hi)) if !hasEqui =>
            val lb = Alias(bucket(pt, width), "__graft_lb")()
            val bucketed = Project(left.output :+ lb, left)
            // Same explode-parallelism guard as Joins.rangeJoin (the two
            // implementations must not drift): the bucket join's output can
            // dwarf its input, and a narrow point side serializes the whole
            // explosion into its few scan tasks with AQE unable to widen it
            // (input-bytes heuristic; the blowup is in the output). A point
            // side whose optimizer size estimate is below
            // numShufflePartitions × maxPartitionBytes arrives in fewer
            // splits than the session parallelism (that product is the
            // split rule) and is cheap to reshuffle by the bucket key; the
            // explicit partition count pins the exchange against AQE
            // coalescing. Larger or unknown-size inputs skip the branch.
            // Blowup-aware build side + spread keys, mirroring
            // Joins.rangeJoin exactly (the two implementations must not
            // drift): the explosion materializes on whichever side
            // STREAMS, and left to its size economics Spark broadcasts a
            // small 1-column point side (BuildLeft), serializing the
            // explode into the window side's AQE-coalesced partitions. A
            // window side whose pre-explode estimate fits the broadcast
            // threshold is therefore HINTED broadcast, and the point side
            // spreads by (__b, point) — full fan-out, no co-partitioning
            // to protect. A larger window side keeps __b alone (the
            // subset-keyed left exchange the shuffle join can reuse).
            val conf = SQLConf.get
            val np = conf.numShufflePartitions
            val windowBroadcasts =
              right.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold
            val spread =
              if (windowBroadcasts) Seq(lb.toAttribute, pt)
              else Seq[Expression](lb.toAttribute)
            val newLeft =
              if (left.stats.sizeInBytes <
                  BigInt(np.toLong) * conf.filesMaxPartitionBytes)
                RepartitionByExpression(spread, bucketed, Some(np))
              else bucketed
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
              LessThanOrEqual(toLong(lo), toLong(hi)),
              seq,
              Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
            val gen = Generate(
              Explode(guarded),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(rb), child = right)
            // The broadcast hint rides the Join node's own hint slot; a
            // user-supplied right-side hint (e.g. an explicit SHUFFLE_HASH)
            // always wins over the heuristic.
            val newHint =
              if (windowBroadcasts && hint.rightHint.isEmpty)
                hint.copy(rightHint =
                  Some(HintInfo(strategy = Some(BROADCAST))))
              else hint
            val newJoin = Join(newLeft, gen, Inner,
              Some(And(EqualTo(lb.toAttribute, rb), cond)), newHint)
            Project(j.output, newJoin)
          case _ => j
        }
    }
  }
}
