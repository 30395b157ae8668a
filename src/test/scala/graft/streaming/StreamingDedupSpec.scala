package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark-bounded streaming exact dedup: duplicates inside the
  * horizon are dropped across micro-batches; a duplicate arriving
  * after state eviction re-emits (bounded state, the documented
  * trade-off); stateless per-row kernels run on streams unchanged. */
class StreamingDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Four files → four AvailableNow micro-batches (maxFilesPerTrigger=1):
    * batch 1 seeds A+B; batch 2 duplicates A inside the horizon (state
    * live — dropped) and advances the watermark far past B's expiry;
    * batch 3 is a filler (state eviction runs at batch END, so B's
    * state is gone only after the watermark-passing batch completes);
    * batch 4 duplicates B after eviction — re-emitted. */
  private lazy val inDir: String = {
    val d = tmpDir("sdedup-in")
    Seq((1L, "doc A", ts("2026-01-01 10:00:00")), (2L, "doc B", ts("2026-01-01 10:00:30")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq((3L, "doc A", ts("2026-01-01 10:01:00")), (4L, "doc C", ts("2026-01-01 12:00:00")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq((5L, "doc D", ts("2026-01-01 12:00:10")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b3.parquet")
    Seq((6L, "doc B", ts("2026-01-01 12:00:30")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b4.parquet")
    // the file source orders micro-batches by modification time; all
    // writes land in the same second, so pin strictly increasing
    // mtimes to make the batch order b1 → b2 → b3 → b4 deterministic
    Seq("b1", "b2", "b3", "b4").zipWithIndex.foreach { case (b, i) =>
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"$b.parquet"))
        .filter(p => p.toString.endsWith(".parquet") && !java.nio.file.Files.isDirectory(p))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L)))
    }
    d
  }

  private def drain(): Unit = {
    val schema = spark.read.parquet(s"$inDir/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*.parquet")
    val q = StreamingDedup.exactDedupStream(stream, "arrival", "10 minutes")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sdedup-ckpt"))
      .format("memory").queryName("sdedup").outputMode("append")
      .start()
    q.awaitTermination()
  }

  test("dups inside the horizon drop; post-eviction dups re-emit (bounded state)") {
    drain()
    val got = spark.table("sdedup").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got.contains(1L) && got.contains(2L) && got.contains(4L) &&
      got.contains(5L), "first sight of each content must emit")
    assert(!got.contains(3L),
      "a duplicate within the watermark horizon must be dropped")
    assert(got.contains(6L),
      "a duplicate after state eviction re-emits — state is bounded by " +
        "the horizon, not by history")
  }

  test("distinct null-text rows are NOT deduped against each other") {
    // md5(null) is null and dropDuplicatesWithinWatermark compares null
    // keys equal — without the sentinel, rows 2 and 3 would collapse.
    val d = tmpDir("snull-in")
    Seq((1L, Some("doc A"), ts("2026-01-01 10:00:00")),
        (2L, None: Option[String], ts("2026-01-01 10:00:10")),
        (3L, None: Option[String], ts("2026-01-01 10:00:20")),
        (4L, Some("doc A"), ts("2026-01-01 10:00:30")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b1.parquet")
    val schema = spark.read.parquet(s"$d/b1.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(s"$d/*.parquet")
    val q = StreamingDedup.exactDedupStream(stream, "arrival", "10 minutes")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("snull-ckpt"))
      .format("memory").queryName("snull").outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("snull").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L),
      "both null-text rows survive; the real text duplicate still drops")
  }

  test("stateless per-row kernels (q25 doc stats) run on a stream unchanged") {
    val docs = Seq((1L, "en", "s", "hello world the end", 19L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
    val d = tmpDir("sstats")
    docs.write.parquet(s"$d/documents.parquet")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$d/documents.parquet")
    // same projection pipeline as the batch query, minus the final sort
    // (append streams cannot globally sort — presentation concern only)
    val q = graft.ops.TextAnalysis.docStatsCols(stream)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sstats-ckpt"))
      .format("memory").queryName("sstats").outputMode("append")
      .start()
    q.awaitTermination()
    val row = spark.table("sstats").head()
    assert(row.getAs[Long]("n_tokens") === 4L)
    assert(row.getAs[Long]("stop_hits") === 1L) // "the"
  }
}
