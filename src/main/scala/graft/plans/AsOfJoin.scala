package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator (SURVEY §2.8 "as-of join",
  * reference tier-(c)): for every left row, attach the LAST right row
  * whose timestamp is at-or-before the left timestamp within the same
  * key group; left rows without a match keep null right columns
  * (left-outer as-of, the semantics of DuckDB's `ASOF LEFT JOIN` and
  * pandas `merge_asof`).
  *
  * Why a custom plan instead of composition: Spark can express as-of
  * only as (a) a union + `last(... IGNORE NULLS)` window — single-table
  * self-as-of only — or (b) a range theta-join + per-left-row argmax,
  * which materializes every candidate pair before discarding all but
  * one (quadratic in dense key groups). The physical operator below is
  * the plan a native engine would pick: hash-partition both sides on
  * the key, sort each partition by (key, ts), then one streamed O(n+m)
  * merge per partition — no candidate blow-up, no per-row buffering
  * beyond a single retained right row, and Spark's own Exchange/Sort
  * machinery (with AQE coalescing, reuse, spill) does all the data
  * movement. At 100 TB this is one shuffle per side — the same cost as
  * the equi-join the as-of generalizes.
  *
  * Null semantics (SQL-consistent): a null in any left key or in the
  * left timestamp never matches; right rows with null keys or null
  * timestamps are never match candidates. Ties: right rows are
  * consumed in (key, ts ASC) order and the LAST at-or-before row wins,
  * so among equal right timestamps the winner is whichever the sort
  * left last — nondeterministic unless the right side is unique per
  * (key, ts). `rightTieBreak` closes that hole deterministically: the
  * tiebreak expressions extend the timestamp ordering
  * lexicographically (sorted in the same direction as ts), so among
  * equal right timestamps the greatest tiebreak wins backward and the
  * least wins forward — "closest in compound (ts, tiebreak…) time".
  * Tiebreak columns never affect WHICH rows qualify, only which tied
  * row is attached.
  */
final case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false,
    rightTieBreak: Seq[Expression] = Nil) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs at least one equi-key on both sides")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin = copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] onto [[AsOfJoinExec]]. Injected by
  * [[GraftExtensions]]; `AsOf.join` also self-installs it via
  * `spark.experimental.extraStrategies` so the API works in plain
  * sessions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, fwd, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, fwd, tb) :: Nil
    case _ => Nil
  }
}

/** `forward = false`: last right row at-or-BEFORE each left timestamp.
  * `forward = true`: first right row at-or-AFTER — the mirror image:
  * both sides sort ts DESCENDING and the merge consumes while
  * `rts >= lts`, so the retained row is the minimal qualifying rts. */
final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false,
    rightTieBreak: Seq[Expression] = Nil) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on the key — EnsureRequirements co-partitions
    * them exactly as it would a shuffled equi-join (and AQE may still
    * coalesce/reuse the exchanges). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (key… asc, ts asc|desc) within partitions; the merge relies on it.
    * Keys always ascend; only the ts direction flips for forward. The
    * right side additionally sorts by the tiebreak expressions in the
    * ts direction, so "last consumed among equal ts" — the row the
    * merge retains — is the deterministic compound-time winner. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val tsDir = if (forward) org.apache.spark.sql.catalyst.expressions.Descending
      else Ascending
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, tsDir),
      (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, tsDir)) ++
        rightTieBreak.map(SortOrder(_, tsDir)))
  }

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTs
    val rt = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(lk, leftOut)
      val rkProj = UnsafeProjection.create(rk, rightOut)
      val ltProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rtProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      // downstream operators (exchanges, codegen consumers) expect
      // UnsafeRow — flatten the JoinedRow view through one projection.
      // MUST bind to `output` (right side nullable), not the child
      // attrs: a non-nullable BoundReference reads the outer-null row
      // as zeros.
      val out = output
      val resultProj = UnsafeProjection.create(out, out)

      new Iterator[InternalRow] {
        // the one right row read but not yet consumable (its key/ts are
        // ahead of the current left cursor), plus its projected key/ts.
        // NO copies here: the iterator's row buffer and each
        // UnsafeProjection's result buffer stay valid until the NEXT
        // advanceRight() call, and these references are only read
        // before then. Rows SKIPPED by the key/null prefix cost zero
        // allocations; every QUALIFYING candidate is copied below
        // (each supersedes the previous — the copy must happen before
        // advanceRight invalidates the buffer, and whether a candidate
        // is the last one isn't known until the next row is read), so
        // a dense group pays O(candidates) copies per left cursor — the
        // same buffer-reuse trade SortMergeJoin makes.
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTs: InternalRow = _
        // last at-or-before match for the current key group (copied:
        // it must outlive the buffers rRow/rKey point into)
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rkProj(rRow)
            rTs = rtProj(rRow)
          } else { rRow = null; rKey = null; rTs = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lkProj(l)
          val lTs = ltProj(l)
          if (lKey.anyNull || lTs.isNullAt(0)) {
            resultProj(joined(l, nullRight)) // null key/ts never matches
          } else {
            // consume right rows on the qualifying side of the left
            // cursor: earlier key groups (skip), same group with null
            // ts (skip), same group with ts at-or-before (backward) /
            // at-or-after (forward) the cursor (candidate) — the ts
            // sort direction makes qualifying rows a prefix either way
            var continue = rRow != null
            while (continue) {
              val c = keyOrd.compare(rKey, lKey)
              val tc = if (c == 0 && !rTs.isNullAt(0)) tsOrd.compare(rTs, lTs) else 0
              if (c < 0 || (c == 0 && rTs.isNullAt(0))) advanceRight()
              else if (c == 0 && (if (forward) tc >= 0 else tc <= 0)) {
                // c == 0 implies rKey is null-free: lKey is null-free
                // here (checked above) and the natural ordering
                // separates null from non-null at the first differing
                // field, so a null-keyed right row can never compare
                // equal — it is consumed by the skip branch.
                lastMatch = rRow.copy(); lastMatchKey = rKey.copy()
                advanceRight()
              } else continue = false
              if (rRow == null) continue = false
            }
            val matched = lastMatch != null &&
              keyOrd.compare(lastMatchKey, lKey) == 0
            resultProj(joined(l, if (matched) lastMatch else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec = copy(left = newLeft, right = newRight)
}
