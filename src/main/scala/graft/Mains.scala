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
  * Configuration comes from `configDir` in either of two shapes:
  * a single `config.ini` in the reference's configparser format
  * (`[configuration]` system section + `[job_<name>]` per job —
  * reference `config.ini` / `extract_script.py:13-30`), or the pair
  * `configuration.properties` + `job_<name>.properties`. The INI wins
  * when both exist. The job ledger lands in `configDir/job_logs.jsonl`.
  * Driver-side only — no Spark session, exactly like the reference's
  * script.
  */
object ExtractTick {
  private def props(path: java.nio.file.Path): Map[String, String] = {
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(path)
    try p.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    p.asScala.toMap
  }

  /** (system config, job definition) from INI or properties files. */
  private[graft] def loadConfig(dir: java.nio.file.Path,
      jobName: String): (Map[String, String], Map[String, String]) = {
    val ini = dir.resolve("config.ini")
    if (java.nio.file.Files.exists(ini)) {
      val sections = extract.IniConfig.read(ini)
      (extract.IniConfig.section(sections, "configuration"),
        extract.IniConfig.section(sections, s"job_$jobName"))
    } else
      (props(dir.resolve("configuration.properties")),
        props(dir.resolve(s"job_$jobName.properties")))
  }

  def main(args: Array[String]): Unit = {
    val Array(configDir, jobName) = args
    val dir = java.nio.file.Paths.get(configDir)
    val (config, job) = loadConfig(dir, jobName)
    val control = new extract.JsonlJobControl(
      dir.resolve("job_logs.jsonl").toString,
      config = config,
      jobs = Map(jobName -> job))
    val res = extract.ExtractJob.run(jobName, control, new extract.JdkHttpBackend())
    println(s"[extract] job=$jobName status=${res.status} rows=${res.rows} " +
      s"file=${res.savedFile.getOrElse("-")}")
    if (res.status != "COMPLETED") sys.exit(1)
  }
}

/** One staging tick: `runMain graft.StagingTick <rawDir> <rawSink>
  * <cleanDir> <ledgerPath> [--retry-failed]` — discover, register,
  * process, report. With `--retry-failed`, FAILED ledger entries are
  * re-queued as NEW before the run (the operator's recovery path after
  * fixing whatever broke; reprocessing is idempotent — the per-file raw
  * sink is overwritten, not appended). */
object StagingTick {
  /** The full CLI behavior minus session lifecycle — testable. */
  private[graft] def run(spark: SparkSession,
      args: Array[String]): etl.StagingPipeline.RunSummary = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val Array(rawDir, rawSink, cleanDir, ledgerPath) = positional
    flags.filterNot(_ == "--retry-failed").foreach { f =>
      sys.error(s"unknown flag $f")
    }
    val pipeline = new etl.StagingPipeline(spark, rawDir, rawSink, cleanDir,
      new etl.JsonlControlStore(ledgerPath))
    if (flags.contains("--retry-failed")) {
      val requeued = pipeline.retryFailed()
      println(s"[staging] retry-failed requeued=${requeued.mkString(",")}")
    }
    val s = pipeline.runOnce()
    println(s"[staging] discovered=${s.discovered} registered=${s.registered} " +
      s"processed=${s.processed.size} failed=${s.failed.mkString(",")}")
    s
  }

  def main(args: Array[String]): Unit = {
    val spark = Mains.session()
    val s = run(spark, args)
    spark.stop()
    if (s.failed.nonEmpty) sys.exit(1)
  }
}

/** One aggregate tick (diagram stage 5): `runMain graft.AggregateTick
  * <warehouseDir> <aggregateDir> <from> <to>` — read the warehouse over
  * [from, to] (partition-pruned), dump the daily aggregate artifact.
  * Idempotent per date via dynamic partition overwrite. */
object AggregateTick {
  def main(args: Array[String]): Unit = {
    val Array(warehouseDir, aggregateDir, from, to) = args
    val spark = Mains.session()
    val rows = etl.WarehouseBuild.aggregate(spark, warehouseDir, aggregateDir, from, to)
    println(s"[aggregate] $from..$to rows=$rows -> $aggregateDir")
    spark.stop()
  }
}

/** One mart tick (diagram stage 6): `runMain graft.MartTick
  * <aggregateDir> <martDir>` — load the aggregate artifact into the
  * mart table, replacing only the dates present in the artifact. */
object MartTick {
  def main(args: Array[String]): Unit = {
    val Array(aggregateDir, martDir) = args
    val spark = Mains.session()
    val rows = etl.WarehouseBuild.loadMart(spark, aggregateDir, martDir)
    println(s"[mart] rows=$rows -> $martDir")
    spark.stop()
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
