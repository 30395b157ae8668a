package graft.plans

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The rule must turn a nested-loop interval join into hash joins
  * without changing a single row. */
class BinnedRangeJoinRuleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  /** GLOBAL 30-minute window join (no equi key at all) — the shape
    * Spark can only nested-loop. */
  private def naturalJoin(): DataFrame = {
    val e = Tables.events(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("vts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
    v.join(p, col("pts") > col("vts") &&
      col("pts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
  }

  test("rewrites the nested-loop interval join to unioned hash joins, losslessly") {
    // control: without the rule this is a nested-loop plan
    val control = naturalJoin()
    assert(control.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val expected = control.collect().map(_.toSeq).toSet

    spark.experimental.extraOptimizations = Seq(BinnedRangeJoinRule)
    try {
      val rewritten = naturalJoin()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not remove the nested loop:\n$plan")
      assert(plan.contains("Union"))
      val got = rewritten.collect().map(_.toSeq).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rule leaves non-matching joins untouched") {
    spark.experimental.extraOptimizations = Seq(BinnedRangeJoinRule)
    try {
      // plain equi join: must not be rewritten into a union
      val n = Tables.nation(spark, dir)
      val r = Tables.region(spark, dir)
      val j = n.join(r, n("n_regionkey") === r("r_regionkey"))
      assert(!j.queryExecution.optimizedPlan.toString.contains("Union"))
      assert(j.count() === 25)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rule is idempotent under repeated optimizer application") {
    val once = BinnedRangeJoinRule(naturalJoin().queryExecution.analyzed)
    val twice = BinnedRangeJoinRule(once)
    assert(once.toString === twice.toString)
  }
}
