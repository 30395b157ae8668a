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

  // ---- AQE-final strategy membership for the heavy graph queries ----
  // RUNTIME_PLANS.txt is deliberately unasserted (ReusedExchange /
  // AQEShuffleRead counters drift with stage materialization order in
  // a long-lived JVM), but the JOIN STRATEGY SET is the property the
  // scale story rests on, and a silent runtime flip should be a red
  // test, not a bench-regression surprise rounds later. These are
  // loose set-membership checks on live (non-cached) join operators —
  // never operator counts.

  private val probeSf = "/root/testdata/sf0.1"

  /** Live join-operator class names per execution. */
  private def joinSets(name: String): Seq[(String, Set[String])] =
    PlanProbe.probe(spark, name, probeSf).map { case (fn, census) =>
      fn -> census.split(" ").toSeq
        .filter(t => t.contains("Join") && !t.startsWith("cached:"))
        .map(_.takeWhile(_ != '×')).toSet
    }

  test("q88 BFS: every per-round relax join runs as BroadcastHashJoin at sf0.1") {
    val execs = joinSets("q88_bfs_hops")
    // the frontier is tiny relative to the edge list in every round,
    // so AQE must broadcast it — a shuffle join here means the
    // stats-less checkpoint leaf pinned the frontier to a data-sized
    // exchange, the exact flip this guards against
    val offending = execs.filter { case (_, joins) =>
      joins.nonEmpty && joins != Set("BroadcastHashJoinExec")
    }
    assert(execs.exists(_._2.nonEmpty),
      s"probe saw no join-bearing executions — harness broke: $execs")
    assert(offending.isEmpty,
      s"BFS relax joins must all be runtime-broadcast at sf0.1; got $offending")
  }

  test("q177 PPR: the data-sized node joins stay shuffle-based at sf0.1") {
    val joins = joinSets("q177_personalized_pagerank").flatMap(_._2).toSet
    // the per-round rank frame is node-sized: it must move by shuffle
    // (SMJ or SHJ), never by broadcast-collect of the whole graph —
    // small constant frames (teleport seeds, degree caps) MAY
    // broadcast, so BHJ presence alone is fine
    assert(joins.exists(Set("SortMergeJoinExec", "ShuffledHashJoinExec")),
      s"q177 lost its shuffle-based node joins at sf0.1 — a runtime " +
        s"broadcast of a data-sized frame is scale-wrong; live joins: $joins")
    assert(!joins.contains("BroadcastNestedLoopJoinExec") &&
      !joins.contains("CartesianProductExec"),
      s"q177 must never plan a nested-loop/cartesian join; got $joins")
  }
}
