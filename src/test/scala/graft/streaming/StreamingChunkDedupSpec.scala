package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** Streaming chunk dedup ≡ batch q94 while state is live (arrival
  * order = doc_id order), and bounded state re-emits after eviction —
  * the same contract StreamingDedupSpec pins for exact dedup. */
class StreamingChunkDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val base = "the quick brown fox jumps over a lazy dog near the " +
    "key value store and the wide table scan path"
  private val tail = "fresh unique closing words never repeated anywhere else"

  /** doc 11 original, 12 full copy, 13 shared prefix, 14 internal dup —
    * the q94 fixture; 14 also advances the watermark 2 h. Doc 99 is a
    * filler batch (eviction with the advanced watermark completes only
    * after the NEXT batch — the StreamingDedupSpec timing); doc 15
    * then re-sends 11's content against evicted state. */
  private val fixture = Seq(
    (11L, base, "2026-01-01 10:00:00"),
    (12L, base, "2026-01-01 10:00:30"),
    (13L, base + " " + tail, "2026-01-01 10:01:00"),
    (14L, tail + " " + tail, "2026-01-01 12:00:00"),
    (99L, "completely disjoint filler content here", "2026-01-01 12:00:10"),
    (15L, base, "2026-01-01 12:00:30"))

  private lazy val inDir: String = {
    val d = tmpDir("schunk-in")
    fixture.zipWithIndex.foreach { case ((id, text, at), i) =>
      Seq((id, text, ts(at))).toDF("doc_id", "text", "arrival")
        .coalesce(1).write.parquet(s"$d/b$i.parquet")
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"b$i.parquet"))
        .filter(p => p.toString.endsWith(".parquet") &&
          !java.nio.file.Files.isDirectory(p))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L)))
    }
    d
  }

  private def drain(): Unit = {
    val schema = spark.read.parquet(s"$inDir/b0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*.parquet")
    val q = StreamingChunkDedup.chunkDedupStream(stream, "arrival", "10 minutes")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("schunk-ckpt"))
      .format("memory").queryName("schunk").outputMode("append")
      .start()
    q.awaitTermination()
  }

  test("surviving chunks ≡ batch q94 while state is live; eviction re-emits") {
    // batch mirror corpus: docs 11–14 (doc 15 arrives post-eviction and
    // is excluded from the mirror — it is the bounded-state trade-off)
    val bd = tmpDir("schunk-batch")
    fixture.take(4).map { case (id, t, _) =>
      (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$bd/documents.parquet")
    val batch = graft.ops.CorpusPrep.paragraphDedup(spark, bd).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap

    drain()
    val rows = spark.table("schunk")
      .select("doc_id", "pos", "chunk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val perDoc = rows.groupBy(_._1)

    // docs 11–14 arrived in doc_id order with all state live: per-doc
    // survivor count and reassembled text equal the batch mirror
    (11L to 14L).foreach { id =>
      val kept = perDoc.getOrElse(id, Array.empty)
      assert(kept.length.toLong === batch(id)._1, s"doc $id n_kept")
      val text = kept.sortBy(_._2).map(_._3).mkString(" ")
      assert(text === batch(id)._2, s"doc $id reassembly")
    }
    assert(!perDoc.contains(12L) || perDoc(12L).isEmpty,
      "the full copy inside the horizon loses every chunk")

    // doc 15 re-sends doc 11's content AFTER the 12:00 batch advanced
    // the watermark past the 10:0x state: its chunks re-emit in full
    val reemit = perDoc.getOrElse(15L, Array.empty)
    assert(reemit.length === perDoc(11L).length,
      "post-eviction duplicate content re-emits — state is bounded by " +
        "the horizon, not history")
  }
}
