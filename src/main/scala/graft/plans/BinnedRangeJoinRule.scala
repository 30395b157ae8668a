package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: rewrite interval theta-joins into binned equi-joins.
  *
  * Users write the natural predicate
  * {{{ r.ts > l.ts && r.ts <= l.ts + INTERVAL w }}}
  * — without an accompanying equality Spark can only plan that as a
  * nested-loop join (O(N·M)); with one, every hot key still explodes
  * quadratically inside its task. This rule adds the lossless bin
  * equality: with bins exactly `w` wide, any qualifying pair has
  * `bin(r.ts) ∈ {bin(l.ts), bin(l.ts)+1}`, and the two cases are
  * disjoint, so
  * {{{ J(cond)  ≡  J(cond && binR = binL)  ∪ALL  J(cond && binR = binL+1) }}}
  * Each branch now carries an extractable equi-key
  * (`unix_micros(ts) div w`) and plans as a hash/sort-merge join; the
  * original predicate stays in place as the exact refinement. Same
  * candidates-then-verify shape as graft's LSH family — this rule just
  * derives it automatically from the natural query. (The Generate/
  * explode form of the rewrite reads each side once instead of twice;
  * the union form is chosen for robustness — no new attributes, no
  * generator resolution.)
  *
  * Fires only on: INNER join, condition containing exactly the
  * lower+upper timestamp pattern on `AttributeReference`s from
  * opposite sides, a positive literal day-time interval width, and no
  * bin equality already present (idempotence guard).
  *
  * Wire up per session via `spark.experimental.extraOptimizations` or
  * globally with `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] {

  private def unwrapCast(e: Expression): Expression = e match {
    case c: Cast if c.child.dataType == c.dataType => unwrapCast(c.child)
    case other => other
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** `lt + INTERVAL w` with a literal positive day-time width. */
  private object TsPlusWidth {
    def unapply(e: Expression): Option[(AttributeReference, Long)] =
      unwrapCast(e) match {
        case add if add.getClass.getSimpleName == "TimestampAddInterval" &&
            add.children.size >= 2 =>
          (add.children.head, add.children(1)) match {
            case (lt: AttributeReference,
                Literal(w: Long, _: DayTimeIntervalType)) if w > 0 =>
              Some((lt, w))
            case _ => None
          }
        case _ => None
      }
  }

  private def bin(ts: Expression, widthUs: Long): Expression =
    IntegralDivide(UnixMicros(ts), Literal(widthUs, LongType))

  private def alreadyBinned(cond: Expression): Boolean =
    cond.exists {
      case EqualTo(l, _) => unwrapCast(l) match {
        case d: IntegralDivide => d.left.isInstanceOf[UnixMicros]
        case _ => false
      }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !alreadyBinned(cond) =>
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
      val matched = uppers.collectFirst {
        case (lt, rt, w)
            if lt.dataType == TimestampType && rt.dataType == TimestampType &&
              lowers.exists(p => p._1.semanticEquals(lt) && p._2.semanticEquals(rt)) &&
              ((left.outputSet.contains(lt) && right.outputSet.contains(rt)) ||
                (right.outputSet.contains(lt) && left.outputSet.contains(rt))) =>
          (lt, rt, w)
      }
      matched match {
        case Some((lt, rt, w)) =>
          val binEq0 = EqualTo(bin(rt, w), bin(lt, w))
          val binEq1 = EqualTo(bin(rt, w), Add(bin(lt, w), Literal(1L, LongType)))
          Union(
            Join(left, right, Inner, Some(And(cond, binEq0)), hint),
            Join(left, right, Inner, Some(And(cond, binEq1)), hint))
        case None => j
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — injects graft's
  * optimizer rules into every session of the application. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => BinnedRangeJoinRule)
}
