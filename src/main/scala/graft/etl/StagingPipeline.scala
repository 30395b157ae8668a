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

  final case class RunSummary(discovered: Int, registered: Int,
      processed: Seq[String], failed: Seq[String])

  /** S7+F5: driver-side listing, like the reference's `os.listdir` —
    * file *names*, not data, so this is control-plane work. */
  private def discover(): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(rawDir),
      spark.sparkContext.hadoopConfiguration)
    val p = new HPath(rawDir)
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

  /** Per-file unit (`process_single_file`, `load_warehouse.py:131-161`):
    * raw-first dual sink, row-count accounting, failure isolation. */
  private def processOne(fileName: String): Boolean = {
    ledger.update(fileName, FileStatus.Processing)
    try {
      val raw = FlightStates.withAudit(
        FlightStates.readRaw(spark, s"$rawDir/$fileName"))
      // K2: raw (untransformed, string-typed) + audit appended FIRST.
      raw.write.mode("append").parquet(rawSinkDir)
      // T1–T4/P1–P4 → K3: clean export, one output per input file.
      val clean = FlightStates.transform(raw)
      val rows = clean.count()
      clean.write.mode("overwrite").option("header", "true")
        .csv(s"$cleanDir/clean_$fileName")
      ledger.update(fileName, FileStatus.CleanExported, rowCount = rows)
      true
    } catch {
      case e: Throwable =>
        ledger.update(fileName, FileStatus.Failed,
          error = Some(String.valueOf(e.getMessage)))
        false
    }
  }

  /** The staged raw table (the reference's `db_staging.raw_flight_states`
    * analog), for downstream warehouse builds. */
  def rawStaged(): DataFrame = spark.read.parquet(rawSinkDir)

  /** All clean exports, re-read as the typed 19-column layout. */
  def cleanStaged(): DataFrame =
    spark.read.option("header", "true")
      .schema(FlightStates.cleanSchema)
      .csv(s"$cleanDir/clean_*")
}
