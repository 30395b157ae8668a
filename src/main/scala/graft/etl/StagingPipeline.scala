package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch staging stage — the reference's `load_warehouse.py` E2 loop
  * (SURVEY.md §3/E2), Spark-first.
  *
  * Per run: discover `states_*.csv` in the raw dir (S7/F5), diff against
  * the ledger (SET1), register new names idempotently (K7), then process
  * each NEW file through the per-file state machine
  * NEW→PROCESSING→CLEAN_EXPORTED|FAILED (K6) with per-file failure
  * isolation (`load_warehouse.py:196-207`).
  *
  * Ordering guarantee preserved from the reference: RAW rows (plus audit
  * columns) land in the raw staging sink BEFORE cleaning
  * (`load_warehouse.py:151` precedes `:153`) — raw preservation survives
  * transform bugs.
  *
  * Scale: each file is processed as one distributed job (Spark splits
  * big files across executors automatically — the reference's 100k-row
  * pandas chunking, S8, is subsumed by file-split partitioning and has
  * no user-visible semantics). The ledger holds one row per FILE, so
  * driver-side control state stays O(files), never O(rows). For
  * exactly-once semantics without an explicit ledger, see
  * [[graft.streaming.FlightStream]] — the checkpointed streaming variant.
  */
final class StagingPipeline(
    spark: SparkSession,
    rawDir: String,
    rawSinkDir: String,
    cleanDir: String,
    ledger: ControlStore) {

  import StagingPipeline.RunSummary

  /** S7+F5: driver-side listing, like the reference's `os.listdir` —
    * file *names*, not data, so this is control-plane work. */
  private def discover(): Seq[String] = {
    // Path.getFileSystem, not FileSystem.get(new URI(...)): a raw dir
    // containing URI-illegal characters (spaces) is a legal PATH that
    // the URI constructor rejects
    val p = new HPath(rawDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("states_") && n.endsWith(".csv"))
      .sorted
  }

  /** One incremental run (the reference's hourly cron tick). */
  def runOnce(): RunSummary = {
    val discovered = discover()
    // SET1: discovered minus already-known, then K7 idempotent register.
    val known = ledger.all().keySet
    val fresh = discovered.filterNot(known)
    ledger.register(fresh)

    val work = ledger.newFiles()
    val (ok, bad) = work.partition(processOne)
    RunSummary(discovered.size, fresh.size, ok, bad)
  }

  /** Re-queue FAILED files as NEW so the next `runOnce` retries them —
    * closes the reference's no-retry gap (a FAILED file is never
    * re-processed because the work list only selects status='NEW';
    * SURVEY §3/E2). Explicit, not automatic: retry policy is the
    * operator's call, exactly like re-running a failed cron tick. */
  def retryFailed(): Seq[String] = {
    val failed = ledger.all().collect {
      case (n, r) if r.status == FileStatus.Failed => n
    }.toSeq.sorted
    failed.foreach(ledger.update(_, FileStatus.New))
    failed
  }

  /** Re-queue PROCESSING files as NEW — CRASH recovery: a driver
    * killed between the Processing mark and the terminal update
    * leaves its file in PROCESSING forever (no selector ever re-reads
    * that status — `newFiles` takes NEW, [[retryFailed]] takes
    * FAILED), silently dropping the file's data. Explicit like
    * [[retryFailed]], and only safe once no run is live; re-processing
    * is idempotent (both sinks overwrite per file). */
  def reclaimProcessing(): Seq[String] = {
    val stuck = ledger.all().collect {
      case (n, r) if r.status == FileStatus.Processing => n
    }.toSeq.sorted
    stuck.foreach(ledger.update(_, FileStatus.New))
    stuck
  }

  /** Per-file unit (`process_single_file`, `load_warehouse.py:131-161`):
    * raw-first dual sink, row-count accounting, failure isolation.
    *
    * One pass per representation (round-1 verdict fix): the source CSV is
    * parsed ONCE into the raw parquet sink (its own subdirectory, so the
    * clean stage prunes to exactly this file's rows); the clean export
    * re-reads the cheap columnar raw copy, and the ledger row count comes
    * from an `Observation` on the clean write — no separate `count()`
    * job. The load timestamp is driver-pinned per file, so raw and clean
    * carry the SAME stamp (reference: one `datetime.now()` per chunk). */
  private def processOne(fileName: String): Boolean = {
    ledger.update(fileName, FileStatus.Processing)
    try {
      val loadTs = java.sql.Timestamp.from(java.time.Instant.now())
      val raw = FlightStates.withAudit(
        FlightStates.readRaw(spark, s"$rawDir/$fileName"), fileName, loadTs)
      // K2: raw (untransformed, string-typed) + audit staged FIRST.
      // Overwrite, not append: the sink subdirectory belongs to exactly
      // this input file, and a retry after a post-raw-write failure
      // (see retryFailed) must replace — not duplicate — its rows.
      raw.write.mode("overwrite").parquet(s"$rawSinkDir/$fileName")
      // T1–T4/P1–P4 → K3: clean export from the staged raw copy, one
      // output per input file; row count observed during the write.
      val obs = org.apache.spark.sql.Observation()
      val clean = FlightStates
        .transform(spark.read.parquet(s"$rawSinkDir/$fileName"))
        .observe(obs, count(lit(1)).as("rows"))
      clean.write.mode("overwrite").option("header", "true")
        // microsecond format: the CSV default keeps only milliseconds,
        // which would desync the driver-pinned load_timestamp between
        // the parquet raw sink (micros) and this export
        .option("timestampFormat", CsvTsFormat)
        .csv(s"$cleanDir/clean_$fileName")
      val rows = obs.get("rows").asInstanceOf[Long]
      ledger.update(fileName, FileStatus.CleanExported, rowCount = rows)
      true
    } catch {
      // NonFatal: a corrupt file must not take the run down (reference
      // semantics, `load_warehouse.py:196-207`), but OOM/thread death
      // must propagate, not masquerade as a FAILED file.
      case scala.util.control.NonFatal(e) =>
        ledger.update(fileName, FileStatus.Failed,
          error = Some(String.valueOf(e.getMessage)))
        false
    }
  }

  /** The staged raw table (the reference's `db_staging.raw_flight_states`
    * analog), for downstream warehouse builds. Per-file subdirectories →
    * recursive lookup. */
  def rawStaged(): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(rawSinkDir)

  /** All clean exports, re-read as the typed 19-column layout. */
  def cleanStaged(): DataFrame =
    spark.read.option("header", "true")
      .option("timestampFormat", CsvTsFormat)
      .schema(FlightStates.cleanSchema)
      .csv(s"$cleanDir/clean_*")

  private def CsvTsFormat = StagingPipeline.CsvTsFormat
}

object StagingPipeline {
  /** Clean-CSV timestamp format with microseconds (lossless round-trip
    * of TimestampType, like pandas `to_csv`). */
  val CsvTsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  final case class RunSummary(discovered: Int, registered: Int,
      processed: Seq[String], failed: Seq[String])
}
