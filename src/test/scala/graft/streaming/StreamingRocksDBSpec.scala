package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

/** The state-store swap the scale story rests on: every stateful
  * operator's docs say "at warehouse scale this state lives in the
  * RocksDB state store" — this spec RUNS that configuration instead
  * of assuming it. The provider is a per-query conf read at stream
  * start, so production flips one setting and nothing else; here the
  * upsert restart scenario (custom `flatMapGroupsWithState` state —
  * the most provider-sensitive operator: typed state encoders,
  * per-key point reads, recovery from snapshot+changelog) must
  * produce byte-identical emissions under RocksDB, including across
  * a checkpoint restart. */
class StreamingRocksDBSpec extends SparkTestBase {

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

  test("upsert emissions and restart recovery are identical under RocksDB state") {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try {
      val in = tmpDir("rocksdb-in")
      val out = tmpDir("rocksdb-out")
      val ckpt = tmpDir("rocksdb-ckpt")
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

      drain()
      assert(spark.read.parquet(out).count() == 2,
        "run 1 under RocksDB must emit each key's first version")

      // across the restart: newer u1 folds, stale u2 is suppressed by
      // state recovered from the RocksDB snapshot/changelog
      Seq((1L, 20L, "purchase", ts("2026-01-01 10:10:00"), 6.0),
          (2L, 21L, "error", ts("2026-01-01 10:01:00"), 7.0))
        .toDF("user_id", "event_id", "event_type", "ts", "value")
        .coalesce(1).write.parquet(s"$in/b2.parquet")
      pinMtime(in, "b2", 1)

      drain()
      val emitted = spark.read.parquet(out)
        .select("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(emitted == Set((1L, 10L), (2L, 12L), (1L, 20L)),
        "RocksDB-backed state must reproduce the default provider's " +
          s"emissions exactly, including restart recovery; got $emitted")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("watermarked dedup state works under RocksDB") {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try {
      val in = tmpDir("rocksdb-dedup-in")
      Seq((1L, "doc A", ts("2026-01-01 10:00:00")),
          (2L, "doc B", ts("2026-01-01 10:00:30")),
          (3L, "doc A", ts("2026-01-01 10:01:00")))
        .toDF("doc_id", "text", "arrival")
        .coalesce(1).write.parquet(s"$in/b1.parquet")
      val schema = spark.read.parquet(s"$in/b1.parquet").schema
      val stream = spark.readStream.schema(schema).parquet(s"$in/*.parquet")
      val q = StreamingDedup.exactDedupStream(stream, "arrival", "10 minutes")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", tmpDir("rocksdb-dedup-ckpt"))
        .format("memory").queryName("rocksdb_dedup").outputMode("append")
        .start()
      q.awaitTermination()
      val got = spark.table("rocksdb_dedup").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L),
        s"dedup under RocksDB must match the default provider, got $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
