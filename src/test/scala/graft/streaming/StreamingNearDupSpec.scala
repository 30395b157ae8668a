package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming MinHash near-dup: in-horizon variants pair with the same
  * Jaccard the batch q28 computes; out-of-horizon arrivals do not pair
  * (bounded state); unrelated docs never pair. */
class StreamingNearDupSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo " +
    "sierra tango uniform victor whiskey xray yankee zulu one two three four"
  private val variant = base.replace("november", "NOVEMBER-CHANGED")
  private val unrelated = "totally different content with no overlap " +
    "whatsoever at all nothing shared here believe me not even a little bit"

  /** b1: base + unrelated; b2: variant inside the horizon (→ pair) and
    * a far-future row that pushes the watermark past b1's buckets;
    * b3: filler (eviction runs at batch end); b4: another copy of base
    * AFTER eviction — no pair with doc 0 (bounded state). */
  private lazy val inDir: String = {
    val d = tmpDir("sneardup-in")
    Seq((0L, base, ts("2026-01-01 10:00:00")),
      (3L, unrelated, ts("2026-01-01 10:00:10")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq((2L, variant, ts("2026-01-01 10:01:00")),
      (7L, "entirely fresh sentence about weather patterns over mountain " +
        "ranges during early spring mornings with fog", ts("2026-01-01 12:00:00")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq((8L, "one more filler document with plenty of harmless words inside",
      ts("2026-01-01 12:00:10")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b3.parquet")
    Seq((5L, base, ts("2026-01-01 12:00:30")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b4.parquet")
    Seq("b1", "b2", "b3", "b4").zipWithIndex.foreach { case (b, i) =>
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"$b.parquet"))
        .filter(p => p.toString.endsWith(".parquet") && !java.nio.file.Files.isDirectory(p))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1100000000000L + i * 60000L)))
    }
    d
  }

  private def drain(): Unit = {
    val schema = spark.read.parquet(s"$inDir/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*.parquet")
    val q = StreamingNearDup.minhashPairsStream(stream, "arrival", horizonMinutes = 10)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sneardup-ckpt"))
      .format("memory").queryName("sneardup").outputMode("append")
      .start()
    q.awaitTermination()
  }

  test("in-horizon pairs match batch q28 exactly; evicted buckets never pair") {
    drain()
    val streamed = spark.table("sneardup")
      .select("doc_a", "doc_b", "j_milli").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // the batch reference on the docs that were in-horizon together
    val d = tmpDir("sneardup-batch")
    Seq((0L, base, "en", "s", 1L), (2L, variant, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val batch = graft.ops.Dedup.minhashPairs(spark, d)
      .select("doc_a", "doc_b", "j_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    assert(streamed === batch,
      s"streamed in-horizon pairs must equal batch q28, got $streamed vs $batch")
    assert(streamed.contains((0L, 2L)), "the near-dup variant pairs")
    assert(!streamed.keySet.exists(p => p._1 == 5L || p._2 == 5L),
      "a copy arriving after bucket eviction must NOT pair (bounded state)")
    assert(!streamed.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated docs never pair")
  }

  test("in-state sortedIntersect == the codegen'd SortedIntersectCount kernel") {
    val rnd = new scala.util.Random(7L)
    val cases = (1 to 300).map { _ =>
      def set() = Array.fill(rnd.nextInt(40))(rnd.nextInt(400)).distinct.sorted
      (set(), set())
    } :+ ((Array.empty[Int], Array(1, 2, 3))) :+ ((Array.empty[Int], Array.empty[Int]))
    val viaKernel = cases.toDF("a", "b").select(
      graft.functions.ArrayFunctions.sortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getLong(0))
    val viaScala = cases.map { case (a, b) => StreamingNearDup.sortedIntersect(a, b) }
    assert(viaKernel.toSeq === viaScala)
  }

  test("exact duplicates in one batch pair once per colliding band, deduped to one") {
    val d = tmpDir("sneardup-dup-in")
    Seq((10L, base, ts("2026-01-01 10:00:00")),
      (11L, base, ts("2026-01-01 10:00:05")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b1.parquet")
    val schema = spark.read.parquet(s"$d/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$d/*.parquet")
    val q = StreamingNearDup.minhashPairsStream(stream, "arrival", horizonMinutes = 10)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sneardup-dup-ckpt"))
      .format("memory").queryName("sneardup_dup").outputMode("append")
      .start()
    q.awaitTermination()
    val rows = spark.table("sneardup_dup").collect()
    // identical docs share all 4 band buckets → at-least-once per band
    assert(rows.length === graft.ops.Dedup.Bands)
    assert(rows.forall(r => r.getAs[Long]("doc_a") == 10L &&
      r.getAs[Long]("doc_b") == 11L && r.getAs[Long]("j_milli") == 1000L))
    val deduped = spark.table("sneardup_dup")
      .select("doc_a", "doc_b", "j_milli").distinct().count()
    assert(deduped === 1L, "one distinct row after the documented dedup step")
  }

  test("a re-delivered doc refreshes its cap slot instead of consuming a second") {
    // cap = 2: doc 20 arrives twice (the duplicate firehose), then doc
    // 21 (near-dup of 20). With one-slot-per-resident, 21 takes the
    // SECOND slot and pairs with 20 exactly once per band; if the
    // re-delivery had occupied it, 21 could never enter the bucket and
    // the pair would be lost entirely.
    val d = tmpDir("sneardup-slot-in")
    Seq((20L, base, ts("2026-01-01 10:00:00")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq((20L, base, ts("2026-01-01 10:00:05")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq((21L, variant, ts("2026-01-01 10:00:10")))
      .toDF("doc_id", "text", "arrival").coalesce(1).write.parquet(s"$d/b3.parquet")
    Seq("b1", "b2", "b3").zipWithIndex.foreach { case (b, i) =>
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"$b.parquet"))
        .filter(p => p.toString.endsWith(".parquet") && !java.nio.file.Files.isDirectory(p))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1200000000000L + i * 60000L)))
    }
    val schema = spark.read.parquet(s"$d/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$d/*.parquet")
    val q = StreamingNearDup.minhashPairsStream(stream, "arrival",
        horizonMinutes = 10, maxBucketDocs = 2)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sneardup-slot-ckpt"))
      .format("memory").queryName("sneardup_slot").outputMode("append")
      .start()
    q.awaitTermination()
    val pairs = spark.table("sneardup_slot")
      .select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((20L, 21L)),
      "the near-dup pair must survive a duplicate re-delivery at cap")
    // and never more than once per band for the pair
    assert(spark.table("sneardup_slot").count() <= graft.ops.Dedup.Bands)
  }
}
