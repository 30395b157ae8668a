package graft

/** Bench's orphan-checkpoint sweep: drops exactly the terminal
  * localCheckpoint blocks a query leaves behind, never plain persisted
  * frames, and never anything when a PipelineCache entry was (re)built
  * during the window (its plan may embed checkpointed ancestors whose
  * truncated lineage must stay alive). */
class BenchSweepSpec extends SparkTestBase {

  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("sweep drops new checkpoint blocks, leaves plain persists, and respects generation") {
    val before = persistedIds
    val g0 = graft.ops.PipelineCache.generation

    val cp = (1 to 50).toDF("x").localCheckpoint(true)
    assert(cp.count() === 50L)
    val plain = (1 to 50).toDF("y").persist()
    assert(plain.count() === 50L)
    val newIds = persistedIds -- before
    assert(newIds.size >= 2, "both frames must register persisted RDDs")

    // generation moved → sweep must be a no-op (simulates an owner
    // query that rebuilt its pipeline entry in the window)
    assert(Bench.sweepOrphanCheckpoints(spark, before, g0 - 1) === 0)
    assert((persistedIds -- before) === newIds, "guarded sweep must drop nothing")

    // generation unchanged → exactly the checkpoint goes, the plain
    // persist stays
    val dropped = Bench.sweepOrphanCheckpoints(spark, before, g0)
    assert(dropped === 1, "exactly the localCheckpoint RDD is an orphan")
    val remaining = persistedIds -- before
    assert(remaining.nonEmpty, "the plain persisted frame must survive")
    assert(plain.count() === 50L, "surviving frame still executable")

    // pre-existing checkpoints (outside `before`-window) are never touched
    assert(Bench.sweepOrphanCheckpoints(spark, persistedIds, g0) === 0)
    plain.unpersist(blocking = true)
  }

  test("withCheckpointSweep sweeps the body's checkpoints on success AND on failure") {
    val before = persistedIds

    val (n, swept) = Bench.withCheckpointSweep(spark) {
      val cp = (1 to 10).toDF("x").localCheckpoint(true)
      cp.count()
    }
    assert(n === 10L)
    assert(swept === 1, "success path sweeps the body's checkpoint")
    assert(persistedIds === before)

    // the failure path must still sweep: a half-run query's terminal
    // checkpoints are exactly as orphaned as a completed one's
    val boom = intercept[RuntimeException] {
      Bench.withCheckpointSweep(spark) {
        val cp = (1 to 10).toDF("x").localCheckpoint(true)
        assert(cp.count() === 10L)
        throw new RuntimeException("query failed mid-run")
      }
    }
    assert(boom.getMessage === "query failed mid-run")
    assert(persistedIds === before,
      "failure path must not leak the checkpoint blocks")
  }
}
