package graft

import org.apache.spark.sql.functions._

/** The runtime-plan census behind `runMain graft.PlanProbe` — the
  * AQE-final complement to the static PLAN_SHAPES.txt golden. These
  * pin the two properties the probe's conclusions rest on: it
  * unwraps AQE query stages to the operators that actually ran, and
  * it separates live operators from a cached relation's internal plan
  * (which executes at most once, when the cache materializes). */
class PlanProbeSpec extends SparkTestBase {

  test("census sees through AQE stage wrappers to the executed join") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val left = spark.range(1000).toDF("k")
      val right = spark.range(10).toDF("k")
      val joined = left.join(right, "k")
      joined.write.format("noop").mode("overwrite").save()
      val c = PlanProbe.census(joined.queryExecution.executedPlan)
      assert(c.contains("Join"),
        s"executed-plan census must surface the join strategy, got: $c")
      assert(!c.contains("QueryStage"),
        s"stage wrappers must be unwrapped, got: $c")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("cached-relation internals are prefixed, not counted as live") {
    val base = spark.range(100).toDF("k")
      .join(spark.range(100).toDF("k"), "k")
      .persist()
    try {
      base.count() // materialize the cache
      val derived = base.groupBy((col("k") % 10).as("b"))
        .agg(count(lit(1)).as("n"))
      derived.write.format("noop").mode("overwrite").save()
      val names = PlanProbe.finalNodes(derived.queryExecution.executedPlan)
      assert(names.exists(n => n.startsWith("cached:") && n.contains("Join")),
        s"the persisted subtree's join must be visible as cached:, got: $names")
      val live = PlanProbe.census(derived.queryExecution.executedPlan)
      assert(!live.contains("Join"),
        s"a cache-read query must report no LIVE join, got: $live")
      assert(live.contains("Exchange"),
        s"the group-by exchange is live, got: $live")
    } finally base.unpersist(blocking = true)
  }
}
