package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Executable architecture invariant: NO query in the whole surface may
  * plan a cartesian product, and nested-loop joins are allowed only
  * where a declared broadcast baseline or a K-row broadcast constant
  * frame makes them linear. A new query that accidentally cross-joins
  * two fact tables fails here, not in production.
  */
class PlanInvariantsSpec extends SparkTestBase {

  /** Queries whose plans legitimately contain BroadcastNestedLoopJoin:
    * either the DECLARED exact Q×N baseline, or crossJoin(broadcast(x))
    * where x is a K-row centroid/codebook/bounds frame — linear scans
    * by construction, argued in each operator's Scaladoc. */
  private val bnlAllowed = Set(
    "q33_ann_bruteforce", // declared exact baseline
    "q34_ann_ivf", "q57_ann_pq", "q58_ann_ivfpq", "q59_kmeans", // K-row centroids/codebooks
    "q72_ann_ivfpq_residual", // K-row centroids/codebooks
    "q49_tfidf_topk", // 1-row corpus count
    "q66_resample_ffill", // 1-row grid bounds
    "q68_triangles", // 1-row stats × 1-row triangle count
    "q70_bm25", // 1-row corpus stats
    "q71_heavy_hitters" // 1-row totals × 1-row sketch
  )

  private def operators(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => operators(a.inputPlan)
      case other => other.children.flatMap(operators) ++
        other.subqueries.flatMap(operators)
    }
    p +: self
  }

  test("no query plans a cartesian product; nested-loop joins only where declared") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        val ops = operators(plan)
        val cartesian = ops.exists(_.isInstanceOf[CartesianProductExec])
        val bnl = ops.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])
        val bad =
          (if (cartesian) Seq(s"$name: CartesianProduct") else Nil) ++
            (if (bnl && !bnlAllowed(name)) Seq(s"$name: undeclared BNLJ") else Nil)
        bad
    }
    assert(offenders.isEmpty,
      s"plan invariant violations:\n${offenders.mkString("\n")}")
  }
}
