package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanLike, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Canonical "plan shape": the sorted multiset of physical operator
  * descriptors of a query's (pre-AQE) physical plan, with scans
  * carrying their read schema and pushed-down filters.
  *
  * This is the round-over-round regression fingerprint the shuffle
  * budget alone can't provide: a broadcast→SMJ flip changes the
  * multiset (`BroadcastHashJoinExec` → `SortMergeJoinExec` + 2 sorts),
  * and a filter that silently stops reaching the parquet scan changes
  * the scan descriptor's `pushed=[…]` — both at CONSTANT shuffle
  * count. `graft.PlanGolden` snapshots every query's shape into a
  * committed artifact; `PlanShapeSpec` recomputes and diffs it, so an
  * unintentional plan change fails a named test and an intentional one
  * is re-blessed by regenerating the artifact in a commit that names
  * the query.
  *
  * Descriptors are class names only — no partition counts, expression
  * IDs, sizes or paths — so the shape is a pure static property of
  * (code, schema), stable across hosts and data scale.
  */
object PlanShape {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val rest = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.inputPlan)
      case other => other.children.flatMap(nodes) ++
        other.subqueries.flatMap(nodes)
    }
    p +: rest
  }

  private def descriptor(p: SparkPlan): String = p match {
    case s: FileSourceScanLike =>
      // `metadata` is the public face of the scan's pushdown state —
      // the same "PushedFilters" string `.explain` prints. Degrade to
      // a marker rather than failing the whole shape if rendering
      // throws (e.g. unevaluated scalar-subquery literals).
      // NonFatal only: an OOM/interrupt mid-snapshot must propagate,
      // not become a bogus "[?]" shape diff in the golden artifact.
      val pushed =
        try s.metadata.getOrElse("PushedFilters", "[]")
        catch { case scala.util.control.NonFatal(_) => "[?]" }
      val cols = s.requiredSchema.map(_.name).mkString("+")
      s"${p.getClass.getSimpleName}(cols=$cols,pushed=$pushed)"
    case _ => p.getClass.getSimpleName
  }

  /** Sorted multiset of operator descriptors for the frame's physical
    * plan (AQE unwrapped to the initial plan; subqueries included).
    * Compute with `spark.sql.adaptive.enabled=false` for the stable
    * full-plan form — AQE's wrapper hides exchange structure until
    * stage materialization. */
  def shape(df: DataFrame): Seq[String] =
    nodes(df.queryExecution.executedPlan).map(descriptor).sorted
}
