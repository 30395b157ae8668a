package graft.plans

import graft.{SparkTestBase, Tables}
import graft.ops.RangeJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The rule must turn a nested-loop interval join into a binned hash
  * join without changing a single row. SparkTestBase runs with
  * `spark.sql.planChangeValidation=true`, so every test here also
  * asserts the rewrite preserves Catalyst's plan invariants (unique
  * ExprIds, resolved output) — the union form this rule used to emit
  * would trip that validation. */
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

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(BinnedRangeJoinRule)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  /** The control plan needs a session WITHOUT the rule — other suites
    * (q43 self-installs, PlanInvariantsSpec plans everything) may have
    * left it installed on the shared session. */
  private def withoutRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == BinnedRangeJoinRule)
    try body finally spark.experimental.extraOptimizations = prev
  }

  test("rewrites the nested-loop interval join to a binned hash join, losslessly") {
    // control: without the rule this is a nested-loop plan
    val expected = withoutRule {
      val c = naturalJoin()
      assert(c.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      c.collect().map(_.toSeq).toSet
    }

    withRule {
      val rewritten = naturalJoin()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not remove the nested loop:\n$plan")
      // single-scan form: one Generate fan-out, no Union of two joins
      assert(plan.contains("Generate"))
      assert(!plan.contains("Union"))
      val got = rewritten.collect().map(_.toSeq).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    }
  }

  test("q43 (natural theta-join query) plans through the rule and matches q41-style grouping") {
    withRule {
      val df = RangeJoin.attributionNatural(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"q43 still nested-loops:\n$plan")
      val got = df.collect()
      assert(got.nonEmpty)
      // spot-check semantics against the unrewritten plan
      spark.experimental.extraOptimizations = Nil
      val expected = RangeJoin.attributionNatural(spark, dir).collect()
      assert(got.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)
    }
  }

  test("GraftExtensions injects the rule into a new session") {
    // `spark.sql.extensions=graft.plans.GraftExtensions` is read from
    // the SparkContext conf only at context creation, so an in-JVM test
    // sharing the suite's context must inject through the same class
    // via withExtensions — the string-config path is what Verify/Bench
    // use (fresh context) and is proven end-to-end by q43's oracle row.
    val base = spark // force the shared session/context to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      val plan = RangeJoin.attributionNatural(s2, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"extension-installed session still nested-loops:\n$plan")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("numeric integral interval joins rewrite too, negatives included") {
    import spark.implicits._
    // offsets straddle zero: truncating-division bins differ from floor
    // bins there, but the two fanned bins still cover every pair
    val l = (-25L to 25L by 3).toDF("x")
    val r = (-30L to 30L by 2).map(v => (v, s"r$v")).toDF("y", "tag")
    def join() = l.join(r, col("y") > col("x") && col("y") <= col("x") + lit(10L))
    val expected = join().collect().map(_.toSeq).toSet
    assert(join().queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    withRule {
      val rewritten = join()
      assert(!rewritten.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(rewritten.collect().map(_.toSeq).toSet === expected)
    }
  }

  test("rule leaves joins that already have an equi key untouched") {
    withRule {
      // plain equi join: must not be rewritten
      val n = Tables.nation(spark, dir)
      val r = Tables.region(spark, dir)
      val j = n.join(r, n("n_regionkey") === r("r_regionkey"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(!opt.contains("Generate"))
      assert(j.count() === 25)
      // q41's manual rewrite carries (user_id, bin) equi keys: the rule
      // must not fan it out a second time
      val q41 = RangeJoin.attribution(spark, dir)
      val once = q41.queryExecution.optimizedPlan
      assert(once.toString.split("Generate").length ===
        2, // exactly the one explode q41 itself writes
        s"rule double-fanned q41:\n$once")
    }
  }

  test("rule is idempotent under repeated optimizer application") {
    val once = BinnedRangeJoinRule(naturalJoin().queryExecution.analyzed)
    val twice = BinnedRangeJoinRule(once)
    assert(once.toString === twice.toString)
  }
}
