package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** The transformWithState upsert must be emission-identical to the
  * flatMapGroupsWithState twin on the fixture that exercises every
  * semantic edge (in-batch version collapse, stale cross-batch
  * suppression, same-microsecond tie by event_id, globally-late but
  * per-key-newer fold, poison rows), including across a checkpoint
  * restart — same operator contract, newer engine API. */
class StreamingUpsertTwsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def pinMtime(dir: String, batch: String, idx: Int): Unit =
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir, s"$batch.parquet"))
      .filter(p => p.toString.endsWith(".parquet") &&
        !java.nio.file.Files.isDirectory(p))
      .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          1000000000000L + idx * 60000L)))

  /** The StreamingUpsertSpec scenario: u1 two in-batch versions then a
    * newer cross-batch one; u2 then a STALE cross-batch record; u3
    * same-microsecond tie; u4 globally-late-but-newer fold. */
  private lazy val inDir: String = {
    val d = tmpDir("tws-in")
    Seq((1L, 10L, "signup", ts("2026-01-01 10:00:00"), 1.0),
        (1L, 11L, "view", ts("2026-01-01 10:05:00"), 2.0),
        (2L, 12L, "click", ts("2026-01-01 10:06:00"), 3.0),
        (3L, 13L, "view", ts("2026-01-01 10:07:00"), 4.0),
        (3L, 14L, "click", ts("2026-01-01 10:07:00"), 5.0),
        (4L, 15L, "signup", ts("2026-01-01 09:00:00"), 8.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq((1L, 20L, "purchase", ts("2026-01-01 10:10:00"), 6.0),
        (2L, 21L, "error", ts("2026-01-01 10:01:00"), 7.0),
        (4L, 22L, "view", ts("2026-01-01 09:30:00"), 9.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq("b1", "b2").zipWithIndex.foreach { case (b, i) => pinMtime(d, b, i) }
    d
  }

  test("transformWithState upsert ≡ flatMapGroupsWithState upsert") {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try {
      val schema = spark.read.parquet(s"$inDir/b1.parquet").schema
      def emissions(name: String,
          op: org.apache.spark.sql.DataFrame =>
            org.apache.spark.sql.Dataset[UpsertRow]): Set[(Long, Long)] = {
        val stream =
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*.parquet")
        val q = op(stream)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", tmpDir(s"tws-ckpt-$name"))
          .format("memory").queryName(name).outputMode("append")
          .start()
        q.awaitTermination()
        spark.table(name).select("user_id", "event_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val tws = emissions("up_tws", StreamingUpsertTws.latest)
      val fmgws = emissions("up_fmgws", StreamingUpsert.latest)
      assert(tws == fmgws,
        s"the two APIs must emit identically; tws=$tws fmgws=$fmgws")
      assert(tws == Set((1L, 11L), (2L, 12L), (3L, 14L), (4L, 15L),
        (1L, 20L), (4L, 22L)),
        s"and both must match the pinned q131-order semantics; got $tws")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("transformWithState state survives a checkpoint restart") {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try {
      val in = tmpDir("tws-restart-in")
      val out = tmpDir("tws-restart-out")
      val ckpt = tmpDir("tws-restart-ckpt")
      Seq((1L, 10L, "signup", ts("2026-01-01 10:00:00"), 1.0),
          (2L, 12L, "click", ts("2026-01-01 10:06:00"), 3.0))
        .toDF("user_id", "event_id", "event_type", "ts", "value")
        .coalesce(1).write.parquet(s"$in/b1.parquet")
      pinMtime(in, "b1", 0)
      val schema = spark.read.parquet(s"$in/b1.parquet").schema

      def drain(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(s"$in/*.parquet")
        val q = StreamingUpsertTws.latest(stream)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", out).outputMode("append")
          .start()
        q.awaitTermination()
      }

      drain()
      Seq((1L, 20L, "purchase", ts("2026-01-01 10:10:00"), 6.0),
          (2L, 21L, "error", ts("2026-01-01 10:01:00"), 7.0)) // stale for u2
        .toDF("user_id", "event_id", "event_type", "ts", "value")
        .coalesce(1).write.parquet(s"$in/b2.parquet")
      pinMtime(in, "b2", 1)
      drain()

      val emitted = spark.read.parquet(out)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(emitted.size == emitted.toSet.size,
        s"no emission may append twice across the restart, got $emitted")
      assert(emitted.toSet == Set((1L, 10L), (2L, 12L), (1L, 20L)),
        "u2's stale version must be suppressed by ValueState recovered " +
          s"from the RocksDB checkpoint; got $emitted")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
