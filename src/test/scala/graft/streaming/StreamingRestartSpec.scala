package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** Checkpoint-restart recovery — the fault-tolerance half of the
  * streaming surface's exactly-once claim, which the per-operator
  * specs (single uninterrupted drain each) never exercise.
  *
  * Protocol: drain batch 1 with AvailableNow to a PARQUET sink (the
  * memory sink refuses checkpoint recovery by design), STOP the
  * query, land batch 2, then start a brand-new query object on the
  * SAME checkpoint. Two distinct recoveries must both hold:
  *
  *   - source offsets: batch 1 is not reprocessed (its rows would
  *     re-append to the file sink — the output multiset would grow);
  *   - operator state: a batch-2 row whose disposition depends on
  *     pre-restart state (a duplicate of batch 1 content; a stale CDC
  *     version behind batch 1's snapshot) is handled by the RECOVERED
  *     state, not re-admitted by an empty one.
  *
  * At warehouse scale this is the restart-after-executor-loss /
  * redeploy path: HDFS-checkpointed offsets + state store, same
  * contract. */
class StreamingRestartSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Pin strictly increasing mtimes so the file source's batch order
    * is deterministic (same-second writes otherwise tie). */
  private def pinMtime(dir: String, batch: String, idx: Int): Unit =
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir, s"$batch.parquet"))
      .filter(p => p.toString.endsWith(".parquet") &&
        !java.nio.file.Files.isDirectory(p))
      .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          1000000000000L + idx * 60000L)))

  test("dedup state and source offsets survive a query restart") {
    val in = tmpDir("restart-dedup-in")
    val out = tmpDir("restart-dedup-out")
    val ckpt = tmpDir("restart-dedup-ckpt")
    Seq((1L, "doc A", ts("2026-01-01 10:00:00")),
        (2L, "doc B", ts("2026-01-01 10:00:30")))
      .toDF("doc_id", "text", "arrival")
      .coalesce(1).write.parquet(s"$in/b1.parquet")
    pinMtime(in, "b1", 0)
    val schema = spark.read.parquet(s"$in/b1.parquet").schema

    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$in/*.parquet")
      val q = StreamingDedup.exactDedupStream(stream, "arrival", "10 minutes")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).outputMode("append")
        .start()
      q.awaitTermination()
    }

    drain() // run 1: b1 only
    val afterRun1 = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(afterRun1 == Set(1L, 2L), s"run 1 must emit b1's two docs, got $afterRun1")

    // land batch 2 AFTER the first query object is gone: a duplicate
    // of b1's "doc A" (within the horizon) and a genuinely new doc
    Seq((3L, "doc A", ts("2026-01-01 10:01:00")),
        (4L, "doc E", ts("2026-01-01 10:02:00")))
      .toDF("doc_id", "text", "arrival")
      .coalesce(1).write.parquet(s"$in/b2.parquet")
    pinMtime(in, "b2", 1)

    drain() // run 2: a NEW query object on the SAME checkpoint
    val rows = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows.size == rows.toSet.size, s"no row may append twice, got $rows")
    val got = rows.toSet
    assert(!got.contains(3L),
      "the cross-restart duplicate must be dropped by RECOVERED dedup " +
        s"state — an empty post-restart state would re-admit it; got $got")
    assert(got == Set(1L, 2L, 4L),
      s"offsets must resume after b1 and the new doc must emit; got $got")
  }

  test("upsert latest-wins state survives a query restart") {
    val in = tmpDir("restart-upsert-in")
    val out = tmpDir("restart-upsert-out")
    val ckpt = tmpDir("restart-upsert-ckpt")
    Seq((1L, 10L, "signup", ts("2026-01-01 10:00:00"), 1.0),
        (2L, 12L, "click", ts("2026-01-01 10:06:00"), 3.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$in/b1.parquet")
    pinMtime(in, "b1", 0)
    val schema = spark.read.parquet(s"$in/b1.parquet").schema

    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$in/*.parquet")
      val q = StreamingUpsert.latest(stream)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).outputMode("append")
        .start()
      q.awaitTermination()
    }

    drain() // run 1
    assert(spark.read.parquet(out).count() == 2,
      "run 1 must emit each key's first version")

    // after the restart boundary: a newer version for u1 (must emit)
    // and a STALE version for u2 — older than u2's pre-restart
    // snapshot, so only the recovered state can know to suppress it
    Seq((1L, 20L, "purchase", ts("2026-01-01 10:10:00"), 6.0),
        (2L, 21L, "error", ts("2026-01-01 10:01:00"), 7.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$in/b2.parquet")
    pinMtime(in, "b2", 1)

    drain() // run 2 on the same checkpoint
    val emitted = spark.read.parquet(out)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(emitted.size == emitted.toSet.size,
      s"no emission may append twice across the restart, got $emitted")
    assert(emitted.toSet == Set((1L, 10L), (2L, 12L), (1L, 20L)),
      "u1's newer version must emit through recovered offsets and " +
        "u2's stale version must be suppressed by the RECOVERED " +
        s"snapshot state (an empty state would re-admit it); got $emitted")
  }
}
