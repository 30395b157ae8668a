package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Poison-record tolerance: one malformed event (null key / ts /
  * value) must NOT kill a 24/7 stateful query — without the
  * `wellFormed` quarantine the typed encoder throws `Null value
  * appeared in non-nullable field` and the QUERY dies, which at
  * warehouse scale means an on-call page for one bad upstream row.
  * Valid rows sharing the batch must still process. */
class StreamingPoisonSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  /** b1 with every null-field poison shape interleaved among valid
    * rows (u1 has two versions; the null event_type row is VALID —
    * String encodes null and unknown types are non-matches). */
  private lazy val inDir: String = {
    val d = tmpDir("poison-in")
    val rows = Seq(
      org.apache.spark.sql.Row(1L, 10L, "signup", ts("2026-01-01 10:00:00"), 1.0),
      org.apache.spark.sql.Row(null, 11L, "view", ts("2026-01-01 10:01:00"), 2.0),
      org.apache.spark.sql.Row(2L, null, "click", ts("2026-01-01 10:02:00"), 3.0),
      org.apache.spark.sql.Row(3L, 13L, "view", null, 4.0),
      org.apache.spark.sql.Row(4L, 14L, "click", ts("2026-01-01 10:04:00"), null),
      org.apache.spark.sql.Row(5L, 15L, null, ts("2026-01-01 10:05:00"), 5.0),
      org.apache.spark.sql.Row(1L, 16L, "purchase", ts("2026-01-01 10:06:00"), 6.0))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.parquet(s"$d/b1.parquet")
    d
  }

  test("upsert survives poison rows and folds the valid ones") {
    val stream = spark.readStream.schema(schema).parquet(s"$inDir/*.parquet")
    val q = StreamingUpsert.latest(stream)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("poison-upsert-ckpt"))
      .format("memory").queryName("poison_upsert").outputMode("append")
      .start()
    q.awaitTermination() // would throw the encoder NPE without the guard
    val got = spark.table("poison_upsert")
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 16L), (5L, 15L)),
      "valid rows must fold latest-wins (u1's two versions collapse in-" +
        s"batch; u5's null event_type is valid); poison rows drop — got $got")
  }

  test("attribution survives poison rows and credits the valid purchase") {
    val stream = spark.readStream.schema(schema).parquet(s"$inDir/*.parquet")
    val q = StreamingAttribution.attribute(stream, "10 minutes")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("poison-attr-ckpt"))
      .format("memory").queryName("poison_attr").outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("poison_attr")
      .select("user_id", "event_id", "channel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 16L, "signup")),
      s"u1's purchase must credit its valid signup touch; got $got")
  }

  test("triples survive poison rows (value-null row participates)") {
    val stream = spark.readStream.schema(schema).parquet(s"$inDir/*.parquet")
    val q = StreamingTriples.triplesStream(stream, "0 seconds")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("poison-tri-ckpt"))
      .format("memory").queryName("poison_tri").outputMode("append")
      .start()
    q.awaitTermination() // no NPE is the contract being pinned
    // only u1 has ≥1 event pair; no user reaches 3 VALID events, so
    // emissions may be empty — the query finishing is the assertion;
    // cross-check the table exists and holds no poison-derived key
    val users = spark.table("poison_tri").select("user_id").collect()
      .map(_.getLong(0)).toSet
    assert(!users.exists(u => u == 2L || u == 3L),
      s"keys reachable only via poison rows must not appear; got $users")
  }
}
