package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming state-store scale measurement (round-10 verdict item 6):
  * the stateful operators are semantics-pinned by their specs, but the
  * 100-TB claim that matters for a firehose — state bounded by the
  * WATERMARK HORIZON, not by input size — was analytic until this
  * main. It drains sfg-scale input (50 k docs / 1 M events at sf1.0,
  * `graft.ScaleDataGen`) through the two state-heaviest operators
  * under the RocksDB provider and records, per micro-batch, the
  * numbers Structured Streaming already publishes for free
  * (StreamingQueryProgress): input rows, processing rate, state rows
  * total/updated/removed, and state memory.
  *
  * `runMain graft.StreamScaleBench [sfDir] [outPath]` →
  * STREAM_SCALE.json. The claim under test is falsifiable from the
  * artifact alone: `peak_state_rows` must plateau (bounded by
  * in-horizon data) while `rows_in_total` grows with the drained
  * input — an unbounded-state defect reads as peak ≈ cumulative at
  * the last batch.
  *
  *   - near-dup: documents spread uniformly over a 240-minute
  *     event-time span, 15-minute horizon → only ~1/16 of the corpus
  *     is ever in state; buckets evict as the watermark passes.
  *   - heavy hitters: events over their native 30-day span, 1-day
  *     tumbling windows, 1-day watermark → ~2 windows of per-user
  *     counts live at once, 30 windows' worth drains through.
  *
  * Input files are range-partitioned by event time with ascending
  * modification times so the file source replays them in time order —
  * the realistic firehose shape (a random file order would advance
  * the watermark to the global max in one batch and drop everything
  * else as late).
  */
object StreamScaleBench {

  private def writeTimeOrdered(df: DataFrame, ts: String, dir: String,
      nFiles: Int): Unit = {
    df.repartitionByRange(nFiles, col(ts))
      .write.mode("overwrite").parquet(dir)
    // range partition i holds the i-th time slice and lands as the
    // i-th part file by name; stamp ascending mtimes so the file
    // source's (modTime, path) order replays event time
    val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.setLastModifiedTime(Paths.get(p),
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
    }
  }

  /** Drain `stream` to the noop sink with AvailableNow and return the
    * per-batch progress JSON rows + a summary. */
  private def drain(spark: SparkSession, name: String, out: DataFrame)
      : (Seq[String], String) = {
    val q = out.writeStream.format("noop")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"/tmp/ssb_ckpt_$name")
      .start()
    q.awaitTermination()
    val progs = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    val rows = progs.map { p =>
      val so = p.stateOperators.headOption
      val mem = so.map(_.memoryUsedBytes).getOrElse(0L)
      val trig = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
      s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
        s""""rows_per_sec":${Bench.num(p.processedRowsPerSecond, 1)},""" +
        s""""trigger_ms":$trig,""" +
        s""""state_rows":${so.map(_.numRowsTotal).getOrElse(0L)},""" +
        s""""state_updated":${so.map(_.numRowsUpdated).getOrElse(0L)},""" +
        s""""state_removed":${so.map(_.numRowsRemoved).getOrElse(0L)},""" +
        s""""state_mem_bytes":$mem}"""
    }
    val totalRows = progs.map(_.numInputRows).sum
    val wallSec = progs.map(p => Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)).sum / 1000.0
    val peakState = progs.flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)
    val endState = progs.lastOption.flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal).getOrElse(0L)
    val peakMem = progs.flatMap(_.stateOperators.headOption)
      .map(_.memoryUsedBytes).foldLeft(0L)(math.max)
    val summary =
      s"""{"rows_in_total":$totalRows,"batches":${progs.size},""" +
        s""""wall_sec":${Bench.num(wallSec, 1)},""" +
        s""""rows_per_sec":${Bench.num(if (wallSec > 0) totalRows / wallSec else 0, 1)},""" +
        s""""peak_state_rows":$peakState,"end_state_rows":$endState,""" +
        s""""peak_state_mem_bytes":$peakMem}"""
    (rows, summary)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scratch/sfg1.0")
    val outPath = args.drop(1).headOption.getOrElse("STREAM_SCALE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("neardup", "hotkeys").foreach { n =>
      val d = Paths.get(s"/tmp/ssb_ckpt_$n")
      if (Files.exists(d)) {
        import scala.sys.process._
        Seq("rm", "-rf", d.toString).!
      }
    }

    // ---- near-dup over documents: 240-min span, 15-min horizon ----
    val spanMin = 240
    val docsB = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nDocs = docsB.count()
    val spacingMs = spanMin * 60000L / math.max(nDocs, 1)
    writeTimeOrdered(
      docsB.withColumn("ts",
        timestamp_millis(lit(1700000000000L) + col("doc_id") * lit(spacingMs))),
      "ts", "/tmp/ssb_docs", 40)
    val docStream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 2)
      .parquet("/tmp/ssb_docs")
    val (ndRows, ndSummary) = drain(spark, "neardup",
      streaming.StreamingNearDup.minhashPairsStream(docStream, "ts", 15).toDF())
    println(s"STREAM neardup $ndSummary")

    // ---- heavy hitters over events: 30-day span, 1-day windows ----
    val evB = Tables.events(spark, sfDir).select(col("ts"), col("user_id"))
    writeTimeOrdered(evB, "ts", "/tmp/ssb_events", 40)
    val evStream = spark.readStream
      .schema("ts TIMESTAMP, user_id LONG")
      .option("maxFilesPerTrigger", 2)
      .parquet("/tmp/ssb_events")
    val (hhRows, hhSummary) = drain(spark, "hotkeys",
      streaming.StreamingHeavyHitters.hotKeys(
        evStream, "ts", col("user_id"), "1 day", "1 day", 50L))
    println(s"STREAM hotkeys $hhSummary")

    val json =
      s"""{"sf":"${Bench.esc(sfDir)}","cpus":"${Bench.esc(cpus)}",""" +
        s""""provider":"rocksdb","ops":{""" +
        s""""neardup":{"summary":$ndSummary,"horizon_min":15,""" +
        s""""span_min":$spanMin,"batches":[${ndRows.mkString(",")}]},""" +
        s""""heavy_hitters":{"summary":$hhSummary,"window":"1 day",""" +
        s""""watermark":"1 day","batches":[${hhRows.mkString(",")}]}}}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json.take(400))
    spark.stop()
  }
}
