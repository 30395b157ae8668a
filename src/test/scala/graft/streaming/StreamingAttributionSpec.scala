package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** Streaming last-touch attribution ≡ the batch rule on event-time-
  * ordered feeds: per purchase, the most recent in-horizon touch wins
  * (with the (us, event_id) tie rule), `direct` otherwise, and state
  * carries touches ACROSS micro-batches. */
class StreamingAttributionSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** u1: click at 10:00, purchase at 10:10 (in a LATER batch — the
    * credited touch must come from state, not the same batch); second
    * purchase at 11:00 — 50 min after the click, outside the 30-min
    * horizon → direct. u2: view then error then purchase in one batch
    * → credited to the LATEST touch (error). u3: purchase with no
    * touch ever → direct. */
  private lazy val inDir: String = {
    val d = tmpDir("sattr-in")
    Seq((1L, 10L, "click", ts("2026-01-01 10:00:00"), 0.0),
      (2L, 11L, "view", ts("2026-01-01 10:01:00"), 0.0),
      (2L, 12L, "error", ts("2026-01-01 10:02:00"), 0.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq((1L, 20L, "purchase", ts("2026-01-01 10:10:00"), 5.0),
      (2L, 21L, "purchase", ts("2026-01-01 10:03:00"), 7.25),
      (3L, 22L, "purchase", ts("2026-01-01 10:04:00"), 1.5))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq((1L, 30L, "purchase", ts("2026-01-01 11:00:00"), 2.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$d/b3.parquet")
    Seq("b1", "b2", "b3").zipWithIndex.foreach { case (b, i) =>
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"$b.parquet"))
        .filter(p => p.toString.endsWith(".parquet") && !java.nio.file.Files.isDirectory(p))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1100000000000L + i * 60000L)))
    }
    d
  }

  test("purchases credit the in-horizon touch held in state; stale touches go direct") {
    val schema = spark.read.parquet(s"$inDir/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*.parquet")
    val q = StreamingAttribution.attribute(stream, "1 minute")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sattr-ckpt"))
      .format("memory").queryName("sattr").outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("sattr").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("channel"), r.getAs[Long]("cents"))).toSet
    assert(got === Set(
      (1L, 20L, "click", 500L), // cross-batch: touch came from state
      (2L, 21L, "error", 725L), // latest of two same-batch touches
      (3L, 22L, "direct", 150L), // no touch ever
      (1L, 30L, "direct", 200L))) // click is 60 min stale > 30-min horizon
  }

  test("a null-typed row is a no-op, not a touch: it must not shadow the real one") {
    // Batch q148's `when(event_type =!= 'purchase', …)` is NULL for a
    // null-typed row and last(…, ignoreNulls) skips it — the stream
    // must match: u4's purchase credits 'email', not null/'direct'.
    val d = tmpDir("sattr-null-in")
    Seq((4L, 40L, Some("email"), ts("2026-01-01 10:00:00"), 0.0),
      (4L, 41L, None: Option[String], ts("2026-01-01 10:01:00"), 0.0),
      (4L, 42L, Some("purchase"), ts("2026-01-01 10:02:00"), 3.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$d/b1.parquet")
    val schema = spark.read.parquet(s"$d/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$d/*.parquet")
    val q = StreamingAttribution.attribute(stream, "1 minute")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sattr-null-ckpt"))
      .format("memory").queryName("sattr_null").outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("sattr_null").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("channel"), r.getAs[Long]("cents"))).toSet
    assert(got === Set((4L, 42L, "email", 300L)))
  }
}
