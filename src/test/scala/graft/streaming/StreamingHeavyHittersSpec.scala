package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Closed-window streaming heavy hitters ≡ the batch aggregation of
  * the same rows — both the exact counts and the count-min grid (the
  * grid merge is vector addition, so state-store merges across
  * micro-batches must reproduce the batch aggregate bit-for-bit). */
class StreamingHeavyHittersSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Window 10:00–10:05 carries the interesting keys, split across two
    * micro-batches (so counts MERGE in the state store across
    * batches); a far-future row in the last batch advances the
    * watermark and closes it. The future row's own window never
    * closes — excluded from every assertion by construction. */
  private lazy val inDir: String = {
    val d = tmpDir("shh-in")
    Seq((7L, ts("2026-01-01 10:00:10")), (7L, ts("2026-01-01 10:00:20")),
      (8L, ts("2026-01-01 10:00:30")), (7L, ts("2026-01-01 10:01:00")))
      .toDF("key", "arrival").coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq((7L, ts("2026-01-01 10:02:00")), (8L, ts("2026-01-01 10:02:30")),
      (9L, ts("2026-01-01 10:03:00")))
      .toDF("key", "arrival").coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq((1L, ts("2026-01-01 12:00:00")))
      .toDF("key", "arrival").coalesce(1).write.parquet(s"$d/b3.parquet")
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

  private val closedStart = ts("2026-01-01 10:00:00")

  test("closed-window hot keys equal the batch counts of the same rows") {
    val q = StreamingHeavyHitters.hotKeys(stream(), "arrival", col("key"),
      "5 minutes", "1 minute", minCount = 2L)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("shh-ckpt"))
      .format("memory").queryName("shh").outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("shh")
      .filter(col("window_start") === closedStart)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // batch truth over the same window's rows: 7→4, 8→2, 9→1 (below 2)
    assert(got === Set((7L, 4L), (8L, 2L)))
  }

  test("closed-window count-min grid is bit-identical to the batch aggregate") {
    val q = StreamingHeavyHitters.windowSketch(stream(), "arrival",
      col("key"), "5 minutes", "1 minute")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("shhg-ckpt"))
      .format("memory").queryName("shhg").outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("shhg")
      .filter(col("window_start") === closedStart)
      .collect().map(_.getSeq[Long](1))
    assert(got.length == 1, "exactly one emission per closed window")
    val batch = spark.read.parquet(s"$inDir/*.parquet")
      .filter(col("arrival") < ts("2026-01-01 10:05:00"))
      .agg(graft.functions.ArrayFunctions.countMinSketch(col("key"),
        graft.ops.HeavyHitters.CmDepth, graft.ops.HeavyHitters.CmWidth))
      .collect().head.getSeq[Long](0)
    assert(got.head == batch)
  }
}
