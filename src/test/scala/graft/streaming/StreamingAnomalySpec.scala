package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Closed-window streaming anomaly flags ≡ the batch scoring of the
  * same rows against the same baseline — including the unseen-key
  * rule (no baseline row ⇒ flagged, dev NULL). */
class StreamingAnomalySpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Window 10:00–10:05: key "click" 4 events (baseline 2 → +1000
    * milli, anomalous at ±500), key "view" 2 events (baseline 2 →
    * 0 milli, normal), key "probe" 1 event (no baseline → unseen-key
    * anomaly). Split across two micro-batches so counts merge in the
    * state store; a far-future row closes the window. */
  private lazy val inDir: String = {
    val d = tmpDir("sa-in")
    Seq(("click", ts("2026-01-01 10:00:10")), ("click", ts("2026-01-01 10:00:20")),
      ("view", ts("2026-01-01 10:00:30")))
      .toDF("key_s", "arrival").coalesce(1).write.parquet(s"$d/b1.parquet")
    Seq(("click", ts("2026-01-01 10:02:00")), ("click", ts("2026-01-01 10:02:10")),
      ("view", ts("2026-01-01 10:03:00")), ("probe", ts("2026-01-01 10:04:00")))
      .toDF("key_s", "arrival").coalesce(1).write.parquet(s"$d/b2.parquet")
    Seq(("late", ts("2026-01-01 12:00:00")))
      .toDF("key_s", "arrival").coalesce(1).write.parquet(s"$d/b3.parquet")
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

  private def baseline() =
    Seq(("click", 2L), ("view", 2L)).toDF("key", "pred")

  test("closed-window flags equal the batch scoring of the same rows") {
    val q = StreamingAnomaly.monitor(stream(), "arrival", col("key_s"),
      "5 minutes", "1 minute", baseline())
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sa-ckpt"))
      .format("memory").queryName("sa").outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.table("sa")
      .filter(col("window_start") === ts("2026-01-01 10:00:00"))
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n_events"),
        Option(r.getAs[java.lang.Long]("dev_milli")).map(_.longValue),
        r.getAs[Long]("is_anomaly"))).toSet
    assert(got === Set(
      ("click", 4L, Some(1000L), 1L), // (4-2)*1000/2 = +1000 ≥ 500
      ("view", 2L, Some(0L), 0L),
      ("probe", 1L, None, 1L))) // unseen key ⇒ anomaly by definition
    // batch mirror: identical scoring over the same closed-window rows
    val batchRows = spark.read.parquet(s"$inDir/b1.parquet", s"$inDir/b2.parquet")
      .filter(col("arrival") < ts("2026-01-01 10:05:00"))
      .groupBy(col("key_s").as("key")).agg(count(lit(1)).as("n_events"))
      .join(broadcast(baseline()), Seq("key"), "left")
      .select(col("key"), col("n_events"),
        when(col("pred").isNotNull,
          expr("(n_events - pred) * 1000 div greatest(pred, 1L)")).as("dev_milli"))
      .withColumn("is_anomaly", when(col("dev_milli").isNull, lit(1L))
        .otherwise((abs(col("dev_milli")) >= graft.ops.Temporal.AnomalyMilli).cast("long")))
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n_events"),
        Option(r.getAs[java.lang.Long]("dev_milli")).map(_.longValue),
        r.getAs[Long]("is_anomaly"))).toSet
    assert(got === batchRows)
  }
}
