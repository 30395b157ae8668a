package graft.ops

import graft.SparkTestBase

class PipelineCacheSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("disabled by default: builds pass through uncached") {
    spark.conf.unset(PipelineCache.ConfKey)
    var builds = 0
    def build = { builds += 1; spark.range(3).toDF("doc_id") }
    PipelineCache.getOrPersist(spark, sf, "owner_a")(build)
    PipelineCache.getOrPersist(spark, sf, "owner_a")(build)
    assert(builds == 2)
  }

  test("enabled: one build per (dir, owner), invalidate forces rebuild") {
    spark.conf.set(PipelineCache.ConfKey, "true")
    try {
      var builds = 0
      def build = { builds += 1; spark.range(3).toDF("doc_id") }
      val a = PipelineCache.getOrPersist(spark, sf, "owner_b")(build)
      val b = PipelineCache.getOrPersist(spark, sf, "owner_b")(build)
      assert(builds == 1 && (a eq b), "second call must return the memo")
      PipelineCache.getOrPersist(spark, sf + "/other", "owner_b")(build)
      assert(builds == 2, "distinct dir must build its own entry")
      PipelineCache.invalidate(spark, "owner_b")
      PipelineCache.getOrPersist(spark, sf, "owner_b")(build)
      assert(builds == 3, "invalidate must force a rebuild")
      PipelineCache.getOrPersist(spark, sf, "owner_b/sub")(build)
      PipelineCache.invalidate(spark, "owner_b")
      PipelineCache.getOrPersist(spark, sf, "owner_b/sub")(build)
      assert(builds == 5, "invalidating the owner must drop owner/ sub-pipelines")
      PipelineCache.invalidate(spark, "owner")
      PipelineCache.getOrPersist(spark, sf, "owner_b/sub")(build)
      assert(builds == 5, "a prefix that is not the owner must not match")
    } finally {
      PipelineCache.clear(spark)
      spark.conf.unset(PipelineCache.ConfKey)
    }
  }

  test("a concurrent first use publishes ONE entry and unpersists the loser's copy") {
    spark.conf.set(PipelineCache.ConfKey, "true")
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val gate = new java.util.concurrent.CountDownLatch(1)
      def build = {
        builds.incrementAndGet()
        gate.await() // hold every builder inside the race window
        spark.range(5).toDF("doc_id")
      }
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = (1 to 4).map(_ => Future(
        PipelineCache.getOrPersist(spark, sf, "owner_race")(build)))
      // wait until at least one thread is inside build, then release
      while (builds.get() == 0) Thread.sleep(5)
      gate.countDown()
      val frames = fs.map(Await.result(_, 30.seconds))
      // every caller gets the SAME published frame
      assert(frames.toSet.size === 1, "all callers must get the winner")
      frames.head.count()
      // After clear(), NO CacheManager entry may survive. A losing
      // racer's copy is invisible to clear (only the stored winner is
      // unpersisted), so a leak shows up as an equivalent fresh plan
      // still reporting a cached storage level — the CacheManager
      // matches by plan, not by Dataset identity.
      PipelineCache.clear(spark)
      assert(spark.range(5).toDF("doc_id").storageLevel ===
        org.apache.spark.storage.StorageLevel.NONE,
        "a losing racer's persisted copy leaked past clear()")
    } finally {
      PipelineCache.clear(spark)
      spark.conf.unset(PipelineCache.ConfKey)
    }
  }

  test("entries are per-session (sessionUUID key) and evicted at application end") {
    spark.conf.set(PipelineCache.ConfKey, "true")
    val other = spark.newSession()
    other.conf.set(PipelineCache.ConfKey, "true")
    try {
      var builds = 0
      def build = { builds += 1; spark.range(3).toDF("doc_id") }
      PipelineCache.getOrPersist(spark, sf, "owner_c")(build)
      PipelineCache.getOrPersist(other, sf, "owner_c")(build)
      assert(builds == 2, "sibling sessions must not share entries")
      PipelineCache.getOrPersist(spark, sf, "owner_c")(build)
      PipelineCache.getOrPersist(other, sf, "owner_c")(build)
      assert(builds == 2, "each session still memoizes its own entry")
      // the application-end listener path, driven directly
      PipelineCache.evictApplication(spark.sparkContext.applicationId)
      PipelineCache.getOrPersist(spark, sf, "owner_c")(build)
      PipelineCache.getOrPersist(other, sf, "owner_c")(build)
      assert(builds == 4, "application end must evict every session's entries")
    } finally {
      PipelineCache.clear(spark)
      PipelineCache.clear(other)
      spark.conf.unset(PipelineCache.ConfKey)
    }
  }

  test("q29/q42 results are identical with the cache on") {
    val off29 = Dedup.nearDedup(spark, sf).collect().toSeq
    val off42 = Similarity.embNearDedup(spark, sf).collect().toSeq
    spark.conf.set(PipelineCache.ConfKey, "true")
    try {
      // derive twice so the second run actually hits the memo
      Dedup.minhashPairs(spark, sf).count()
      Similarity.embNearDup(spark, sf).count()
      assert(Dedup.nearDedup(spark, sf).collect().toSeq == off29)
      assert(Similarity.embNearDedup(spark, sf).collect().toSeq == off42)
    } finally {
      PipelineCache.clear(spark)
      spark.conf.unset(PipelineCache.ConfKey)
    }
  }

  test("unpersistCheckpoint really frees localCheckpoint blocks (Dataset.unpersist cannot)") {
    import spark.implicits._
    def persistedIds: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = persistedIds
    val df = (1 to 100).toDF("x").localCheckpoint(true)
    assert(df.count() === 100L)
    val afterCkpt = persistedIds
    assert((afterCkpt -- before).nonEmpty, "checkpoint must register an RDD")
    // the plain Dataset.unpersist path is a no-op for checkpoints —
    // this is WHY the round-cache eviction goes through the bridge
    df.unpersist(blocking = true)
    assert((persistedIds -- before).nonEmpty,
      "precondition: Dataset.unpersist left the checkpoint RDD behind")
    val dropped = org.apache.spark.sql.graftbridge.GraftBridge
      .unpersistCheckpoint(df)
    assert(dropped, "a LogicalRDD leaf must be found")
    assert((persistedIds -- before).isEmpty,
      "the checkpoint RDD must be gone after unpersistCheckpoint")
  }

  test("generation moves on a build, not on a cache hit (Bench sweep guard)") {
    spark.conf.set(PipelineCache.ConfKey, "true")
    try {
      def build = spark.range(3).toDF("doc_id")
      val g0 = PipelineCache.generation
      PipelineCache.getOrPersist(spark, sf, "owner_gen")(build)
      assert(PipelineCache.generation == g0 + 1, "miss must bump generation")
      PipelineCache.getOrPersist(spark, sf, "owner_gen")(build)
      assert(PipelineCache.generation == g0 + 1, "hit must NOT bump generation")
      PipelineCache.invalidate(spark, "owner_gen")
      PipelineCache.getOrPersist(spark, sf, "owner_gen")(build)
      assert(PipelineCache.generation == g0 + 2,
        "rebuild after invalidate must bump generation (owner queries " +
          "always read as generation-moved, so Bench never sweeps them)")
    } finally {
      PipelineCache.clear(spark)
      spark.conf.unset(PipelineCache.ConfKey)
    }
  }

  test("isLocallyCheckpointed bridge discriminates checkpoint blocks from plain persists") {
    import spark.implicits._
    val bridge = org.apache.spark.sql.graftbridge.GraftBridge
    val cp = (1 to 10).toDF("x").localCheckpoint(true)
    val plain = (1 to 10).toDF("y").persist()
    plain.count()
    val persisted = spark.sparkContext.getPersistentRDDs.values.toSeq
    assert(persisted.exists(bridge.isLocallyCheckpointed),
      "the checkpoint RDD must report locally-checkpointed")
    assert(persisted.exists(r => !bridge.isLocallyCheckpointed(r)),
      "the plain persisted frame must NOT report locally-checkpointed " +
        "(Bench's sweep must never touch cache-manager blocks)")
    plain.unpersist(blocking = true)
    assert(bridge.unpersistCheckpoint(cp))
  }

  test("unpersistCheckpoint refuses a DERIVED plan embedding a shared checkpoint") {
    import spark.implicits._
    def persistedIds: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = persistedIds
    val cp = (1 to 100).toDF("x").localCheckpoint(true)
    assert(cp.count() === 100L)
    // a plan DERIVED from the checkpoint is not itself the checkpoint:
    // unpersisting through it would destroy the shared frame's blocks,
    // and (lineage truncated) the shared frame would then throw.
    val derived = cp.filter($"x" > 50).selectExpr("x * 2 AS y")
    val dropped = org.apache.spark.sql.graftbridge.GraftBridge
      .unpersistCheckpoint(derived)
    assert(!dropped, "derived plans must be refused, not reached into")
    assert((persistedIds -- before).nonEmpty,
      "the shared checkpoint's blocks must survive the refused call")
    assert(derived.count() === 50L, "shared frame still executable")
    // the checkpoint frame itself is still accepted
    assert(org.apache.spark.sql.graftbridge.GraftBridge
      .unpersistCheckpoint(cp))
    assert((persistedIds -- before).isEmpty)
  }
}
