package graft

import org.apache.spark.sql.SparkSession

/** Operational entry points — the reference ships two cron scripts
  * (`extract_script.py <job>` every 10 min, `load_warehouse.py`
  * hourly); these mains are their runnable equivalents plus the
  * streaming upgrade. Session settings match Verify/Bench (UTC, local
  * parallelism from SPARK_GRAFT_CPUS, nanos-as-long for the harness
  * parquet).
  */
object Mains {
  private[graft] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
  }
}

/** One extract tick: `runMain graft.ExtractTick <configDir> <jobName>`.
  *
  * `configDir` holds `configuration.properties` (system config, S3) and
  * `job_<name>.properties` (the job-definition row, S4); the job ledger
  * lands in `configDir/job_logs.jsonl`. Driver-side only — no Spark
  * session, exactly like the reference's script.
  */
object ExtractTick {
  private def props(path: java.nio.file.Path): Map[String, String] = {
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(path)
    try p.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    p.asScala.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(configDir, jobName) = args
    val dir = java.nio.file.Paths.get(configDir)
    val control = new extract.JsonlJobControl(
      dir.resolve("job_logs.jsonl").toString,
      config = props(dir.resolve("configuration.properties")),
      jobs = Map(jobName -> props(dir.resolve(s"job_$jobName.properties"))))
    val res = extract.ExtractJob.run(jobName, control, new extract.JdkHttpBackend())
    println(s"[extract] job=$jobName status=${res.status} rows=${res.rows} " +
      s"file=${res.savedFile.getOrElse("-")}")
    if (res.status != "COMPLETED") sys.exit(1)
  }
}

/** One staging tick: `runMain graft.StagingTick <rawDir> <rawSink>
  * <cleanDir> <ledgerPath>` — discover, register, process, report. */
object StagingTick {
  def main(args: Array[String]): Unit = {
    val Array(rawDir, rawSink, cleanDir, ledgerPath) = args
    val spark = Mains.session()
    val pipeline = new etl.StagingPipeline(spark, rawDir, rawSink, cleanDir,
      new etl.JsonlControlStore(ledgerPath))
    val s = pipeline.runOnce()
    println(s"[staging] discovered=${s.discovered} registered=${s.registered} " +
      s"processed=${s.processed.size} failed=${s.failed.mkString(",")}")
    spark.stop()
    if (s.failed.nonEmpty) sys.exit(1)
  }
}

/** Streaming drain: `runMain graft.StreamingDrain <rawDir> <rawSink>
  * <cleanSink> <checkpoint>` — the checkpointed exactly-once variant. */
object StreamingDrain {
  def main(args: Array[String]): Unit = {
    val Array(rawDir, rawSink, cleanSink, ckpt) = args
    val spark = Mains.session()
    streaming.FlightStream.stageAvailableNow(spark, rawDir, rawSink, cleanSink, ckpt)
    println(s"[stream] drained $rawDir -> $cleanSink (checkpoint $ckpt)")
    spark.stop()
  }
}
