package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** Streaming latest-wins upsert ≡ q131's batch compaction: per key,
  * the last emission equals the event-time-latest record regardless of
  * arrival order; in-batch older versions collapse to one emission;
  * stale cross-batch arrivals emit nothing. */
class StreamingUpsertSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** u1: two versions in batch 1 (only the later emits), then a newer
    * one in batch 2 (second emission). u2: one version in batch 1,
    * then a STALE older record in batch 2 — it REACHES the operator
    * (no watermark pre-filter) and the monotone-state check suppresses
    * it: no emission, snapshot must not regress. u3: same-microsecond
    * tie broken by event_id. u4: batch-2 record is GLOBALLY late
    * (09:30, far behind every other key's event time — a watermark
    * would have dropped it pre-operator) yet newer than u4's own 09:00
    * state → must fold and emit. */
  private lazy val inDir: String = {
    val d = tmpDir("supsert-in")
    Seq((1L, 10L, "signup", ts("2026-01-01 10:00:00"), 1.0),
      (1L, 11L, "view", ts("2026-01-01 10:05:00"), 2.0),
      (2L, 12L, "click", ts("2026-01-01 10:06:00"), 3.0),
      (3L, 13L, "view", ts("2026-01-01 10:07:00"), 4.0),
      (3L, 14L, "click", ts("2026-01-01 10:07:00"), 5.0),
      (4L, 15L, "signup", ts("2026-01-01 09:00:00"), 8.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq((1L, 20L, "purchase", ts("2026-01-01 10:10:00"), 6.0),
      (2L, 21L, "error", ts("2026-01-01 10:01:00"), 7.0), // stale for u2
      (4L, 22L, "view", ts("2026-01-01 09:30:00"), 9.0)) // late globally, newer for u4
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq("b1", "b2").zipWithIndex.foreach { case (b, i) =>
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"$b.parquet"))
        .filter(p => p.toString.endsWith(".parquet") && !java.nio.file.Files.isDirectory(p))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1100000000000L + i * 60000L)))
    }
    d
  }

  test("latest-wins emissions fold to the q131 batch compaction; stale rows never regress") {
    val schema = spark.read.parquet(s"$inDir/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*.parquet")
    val q = StreamingUpsert.latest(stream)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("supsert-ckpt"))
      .format("memory").queryName("supsert").outputMode("append")
      .start()
    q.awaitTermination()
    val rows = spark.table("supsert").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("us"),
        r.getAs[Long]("value_cents")))
    // u1 emits twice (batch1 collapse → view, batch2 → purchase);
    // u2 emits ONCE (stale batch-2 row suppressed BY THE STATE CHECK —
    // no watermark exists to drop it first); u3 once with the event_id
    // tie-break; u4 emits twice (the globally-late batch-2 row is
    // newer than u4's state and must fold).
    assert(rows.length === 6)
    val byUser = rows.groupBy(_._1)
    assert(byUser(1L).map(_._2).toSet === Set(11L, 20L))
    assert(byUser(2L).map(_._2).toSeq === Seq(12L))
    assert(byUser(3L).map(_._2).toSeq === Seq(14L))
    assert(byUser(4L).map(_._2).toSet === Set(15L, 22L))
    // final snapshot (last emission per key) ≡ the batch latest-wins
    // rule over the full input
    val all = spark.read.parquet(s"$inDir/*.parquet").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000L,
        math.round(r.getAs[Double]("value") * 100)))
    val batchLatest = all.groupBy(_._1).view.mapValues(
      _.maxBy(t => (t._4, t._2))).toMap
    val streamLatest = rows.groupBy(_._1).view.mapValues(
      _.maxBy(t => (t._4, t._2))).toMap
    assert(streamLatest === batchLatest)
  }
}
