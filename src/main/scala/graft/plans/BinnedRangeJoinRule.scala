package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: rewrite interval theta-joins into binned equi-joins.
  *
  * Users write the natural predicate
  * {{{ r.ts > l.ts && r.ts <= l.ts + INTERVAL w }}}
  * — without an accompanying equality Spark can only plan that as a
  * nested-loop join (O(N·M)), a scale killer. This rule derives the
  * lossless bin equality: with bins exactly `w` wide, any qualifying
  * pair has `bin(r.ts) ∈ {bin(l.ts), bin(l.ts)+1}`, so fanning the
  * `l.ts` side out to those two bins (a Generate/explode — each input
  * is still scanned ONCE) and equating `bin(r.ts)` with the fanned-out
  * bin turns the join into a plain hash-shuffle equi-join; the original
  * interval predicate stays in place as the exact refinement. The two
  * bins are always distinct, so each qualifying pair matches exactly
  * one fanned row — no duplicates, no Union (the earlier union-of-two-
  * joins form scanned both inputs twice and reused child ExprIds across
  * sibling branches, violating Catalyst's unique-attribute invariant).
  * Same candidates-then-verify shape as graft's LSH family — this rule
  * just derives it automatically from the natural query.
  *
  * Fires only on: INNER join whose condition has NO extractable
  * equi-join key (if one exists Spark already hash-joins; adding a bin
  * key would only fan out rows — and this guard is also what makes the
  * rule idempotent, since the rewritten join carries the bin equality),
  * containing exactly the lower+upper pattern on `AttributeReference`s
  * from opposite sides: timestamps with a positive literal day-time
  * interval width, or same-type integral columns (long/int/short) with
  * a positive same-type literal width (`r.x > l.x && r.x <= l.x + c`).
  *
  * Wire up per session via `spark.experimental.extraOptimizations` or
  * globally with `spark.sql.extensions=graft.plans.GraftExtensions`
  * (the Verify/Bench harness sessions do the latter, so q43 — the
  * natural spelling of q41's interval join — exercises this rule under
  * the DuckDB oracle).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def unwrapCast(e: Expression): Expression = e match {
    case c: Cast if c.child.dataType == c.dataType => unwrapCast(c.child)
    case other => other
  }

  private def conjuncts(e: Expression): Seq[Expression] =
    splitConjunctivePredicates(e)

  /** `lt + w`: a timestamp plus a literal positive day-time interval,
    * or an integral column plus a literal positive integral constant.
    * Returns the width in the column's own units (µs for timestamps).
    * The timestamp arm matches the Catalyst class DIRECTLY — an earlier
    * `getClass.getSimpleName == "TimestampAddInterval"` comparison
    * would have silently stopped firing (plan degrades to a
    * nested-loop join with no error) on any Spark refactor that
    * renames the node; a class match breaks the COMPILE instead. */
  private object TsPlusWidth {
    def unapply(e: Expression): Option[(AttributeReference, Long)] =
      unwrapCast(e) match {
        case TimestampAddInterval(lt: AttributeReference,
            Literal(w: Long, _: DayTimeIntervalType), _) if w > 0 =>
          Some((lt, w))
        case Add(lt: AttributeReference, Literal(w, t), _)
            if integralWidth(w, t).exists(_ > 0) =>
          Some((lt, integralWidth(w, t).get))
        case Add(Literal(w, t), lt: AttributeReference, _)
            if integralWidth(w, t).exists(_ > 0) =>
          Some((lt, integralWidth(w, t).get))
        case _ => None
      }
  }

  private def integralWidth(w: Any, t: org.apache.spark.sql.types.DataType): Option[Long] =
    (w, t) match {
      case (v: Long, LongType) => Some(v)
      case (v: Integer, _: org.apache.spark.sql.types.IntegerType) => Some(v.longValue)
      case (v: java.lang.Short, _: org.apache.spark.sql.types.ShortType) => Some(v.longValue)
      case _ => None
    }

  /** Bin id in the column's own units. Truncating division is fine for
    * negatives too: for any l < r ≤ l+w, `r quot w − l quot w ∈ {0, 1}`
    * (quot is monotone and quot(x+w) ≤ quot(x)+1), so the two fanned
    * bins still cover every qualifying pair — lossless either way. */
  private def bin(x: Expression, width: Long): Expression = {
    val units = x.dataType match {
      case TimestampType => UnixMicros(x)
      case LongType => x
      case _ => Cast(x, LongType)
    }
    IntegralDivide(units, Literal(width, LongType))
  }

  /** True when `a = b` (or `<=>`) splits cleanly across the two join
    * sides — i.e. Spark can already extract it as a hash-join key. */
  private def isEquiKey(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    def across(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
         (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet)))
    e match {
      case EqualTo(a, b) => across(a, b)
      case EqualNullSafe(a, b) => across(a, b)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !conjuncts(cond).exists(isEquiKey(_, left, right)) =>
      val cs = conjuncts(cond)
      // lower bound: rt > lt (either spelling)
      val lowers = cs.collect {
        case GreaterThan(rt: AttributeReference, lt: AttributeReference) => (lt, rt)
        case LessThan(lt: AttributeReference, rt: AttributeReference) => (lt, rt)
        case GreaterThanOrEqual(rt: AttributeReference, lt: AttributeReference) => (lt, rt)
        case LessThanOrEqual(lt: AttributeReference, rt: AttributeReference) => (lt, rt)
      }
      // upper bound: rt <= lt + w (or rt < lt + w)
      val uppers = cs.collect {
        case LessThanOrEqual(rt: AttributeReference, TsPlusWidth(lt, w)) => (lt, rt, w)
        case LessThan(rt: AttributeReference, TsPlusWidth(lt, w)) => (lt, rt, w)
        case GreaterThanOrEqual(TsPlusWidth(lt, w), rt: AttributeReference) => (lt, rt, w)
        case GreaterThan(TsPlusWidth(lt, w), rt: AttributeReference) => (lt, rt, w)
      }
      val binnable = Set[org.apache.spark.sql.types.DataType](TimestampType,
        LongType, org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType)
      val matched = uppers.collectFirst {
        case (lt, rt, w)
            if lt.dataType == rt.dataType && binnable(lt.dataType) &&
              lowers.exists(p => p._1.semanticEquals(lt) && p._2.semanticEquals(rt)) &&
              ((left.outputSet.contains(lt) && right.outputSet.contains(rt)) ||
                (right.outputSet.contains(lt) && left.outputSet.contains(rt))) =>
          (lt, rt, w)
      }
      matched match {
        case Some((lt, rt, w)) =>
          // Fan the lt side out to its window's ≤2 bins. Null-ts rows
          // are filtered BELOW the fan-out: they could never satisfy
          // the retained interval predicate, but unfiltered they would
          // explode into TWO null-bin rows each and ride the exchange
          // as dead weight (2× the null rows through the shuffle).
          val binOut = AttributeReference("_graft_bin", LongType)()
          val bins = CreateArray(Seq(
            bin(lt, w), Add(bin(lt, w), Literal(1L, LongType))))
          def fanOut(side: LogicalPlan): LogicalPlan =
            Generate(Explode(bins), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(binOut),
              child = org.apache.spark.sql.catalyst.plans.logical.Filter(
                IsNotNull(lt), side))
          val (newLeft, newRight) =
            if (left.outputSet.contains(lt)) (fanOut(left), right)
            else (left, fanOut(right))
          val newCond = And(cond, EqualTo(bin(rt, w), binOut))
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — injects graft's
  * optimizer rules and planner strategies into every session of the
  * application. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BinnedRangeJoinRule)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
