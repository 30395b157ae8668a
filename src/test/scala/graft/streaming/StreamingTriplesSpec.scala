package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streamed trigrams ≡ the batch lead-lead extraction over the same
  * admissible rows — including the cross-batch OUT-OF-ORDER case the
  * naive append-to-state version gets wrong. */
class StreamingTriplesSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** User 1's B arrives in a LATER micro-batch than A and C but lands
    * between them in event time (admitted: within the 1h watermark
    * horizon). The only correct trigram is (A,B,C); arrival order
    * would claim (A,C,B). User 2 is in-order across batches. The
    * far-future row advances the watermark past everything. */
  private lazy val inDir: String = {
    val d = tmpDir("st-in")
    Seq((1L, 10L, ts("2026-01-01 10:00:00"), "A"),
      (1L, 11L, ts("2026-01-01 10:02:00"), "C"),
      (2L, 20L, ts("2026-01-01 10:00:00"), "X"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq((1L, 12L, ts("2026-01-01 10:01:00"), "B"),
      (2L, 21L, ts("2026-01-01 10:01:00"), "Y"),
      (2L, 22L, ts("2026-01-01 10:02:00"), "Z"),
      (2L, 23L, ts("2026-01-01 10:03:00"), "X"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq((9L, 90L, ts("2026-01-02 12:00:00"), "A"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .coalesce(1).write.parquet(s"$d/b3.parquet")
    Seq("b1", "b2", "b3").zipWithIndex.foreach { case (b, i) =>
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"$b.parquet"))
        .filter(p => p.toString.endsWith(".parquet") && !java.nio.file.Files.isDirectory(p))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1100000000000L + i * 60000L)))
    }
    d
  }

  private def stream() = {
    val schema = spark.read.parquet(s"$inDir/b1.parquet").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*.parquet")
  }

  test("streamed trigrams equal the batch mirror, with the straggler placed by event time") {
    val q = StreamingTriples.triplesStream(stream(), "1 hour")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("st-ckpt"))
      .format("memory").queryName("st").outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("st")
      .select("user_id", "e1", "e2", "e3")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    // batch truth over the finalized region (everything before the
    // far-future row, whose own trigrams never complete)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val batch = spark.read.parquet(s"$inDir/*.parquet")
      .filter(col("ts") < ts("2026-01-02 00:00:00"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(batch === Set((1L, "A", "B", "C"), (2L, "X", "Y", "Z"), (2L, "Y", "Z", "X")))
    assert(got === batch,
      "streamed trigrams must match the event-time batch mirror")
  }

  test("a re-drain from the same checkpoint emits nothing new (exactly-once)") {
    val ckpt = tmpDir("st-ckpt2")
    val out = tmpDir("st-out")
    def drain(): Long = {
      val q = StreamingTriples.triplesStream(stream(), "1 hour")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).outputMode("append")
        .start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    val first = drain()
    val second = drain()
    assert(first === 3L)
    assert(second === first, "second drain from the same checkpoint re-emits")
  }
}
