package graft.etl

import graft.SparkTestBase
import java.nio.file.{Files, Paths, StandardCopyOption}

/** End-to-end staging runs over real fixture extracts: state machine,
  * raw-first ordering, row-count accounting, failure isolation, retry. */
class StagingPipelineSpec extends SparkTestBase {

  private def setup(copy: Int = 2): (StagingPipeline, JsonlControlStore, String) = {
    val rawDir = tmpDir("raw")
    val fixtures = Files.list(Paths.get(fixturesDir)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".csv")).sortBy(_.getFileName.toString)
    fixtures.take(copy).foreach { f =>
      Files.copy(f, Paths.get(rawDir, f.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // a non-matching name the discovery predicate must skip (F5)
    Files.writeString(Paths.get(rawDir, "notes.txt"), "not a states file")
    Files.writeString(Paths.get(rawDir, "other_states.csv"), "wrong,prefix")
    val ledger = new JsonlControlStore(s"${tmpDir("ledger")}/file_log.jsonl")
    val p = new StagingPipeline(spark, rawDir, tmpDir("rawsink"),
      tmpDir("clean"), ledger)
    (p, ledger, rawDir)
  }

  test("runOnce processes exactly the states_*.csv files and books row counts") {
    val (p, ledger, _) = setup(copy = 2)
    val s = p.runOnce()
    assert(s.discovered === 2) // notes.txt / other_states.csv excluded
    assert(s.registered === 2)
    assert(s.failed === Seq.empty)
    assert(s.processed.size === 2)
    val recs = ledger.all()
    assert(recs.values.forall(_.status === FileStatus.CleanExported))
    // ledger row counts equal the actual cleaned rows per file
    val perFile = p.cleanStaged().groupBy("file_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    recs.foreach { case (name, r) => assert(perFile(name) === r.rowCount) }
  }

  test("second runOnce is a no-op (ledger-driven incrementality)") {
    val (p, _, _) = setup(copy = 1)
    assert(p.runOnce().processed.size === 1)
    val again = p.runOnce()
    assert(again.registered === 0)
    assert(again.processed === Seq.empty)
    assert(again.failed === Seq.empty)
  }

  test("raw lands string-typed with audit before cleaning; stamps match clean") {
    val (p, _, _) = setup(copy = 1)
    p.runOnce()
    val raw = p.rawStaged()
    // raw sink preserves the untyped source (strings) + audit columns
    assert(raw.schema("on_ground").dataType.typeName === "string")
    assert(raw.columns.contains("load_timestamp"))
    // driver-pinned stamp: raw and clean share the same load_timestamp set
    val rawTs = raw.select("load_timestamp").distinct().collect().toSet
    val cleanTs = p.cleanStaged().select("load_timestamp").distinct().collect().toSet
    assert(rawTs === cleanTs && rawTs.size === 1)
  }

  test("failure isolation: a vanished file fails alone; retryFailed re-queues it") {
    val (p, ledger, rawDir) = setup(copy = 1)
    // discovered then removed before processing — the realistic race
    val ghost = "states_ghost.csv"
    Files.writeString(Paths.get(rawDir, ghost), "will vanish")
    val names = new java.io.File(rawDir).list().toSeq
    assert(names.contains(ghost))
    Files.writeString(Paths.get(rawDir, ghost), "x") // keep file, corrupt? no —
    Files.delete(Paths.get(rawDir, ghost))
    ledger.register(Seq(ghost)) // as if discovered by an earlier tick
    val s = p.runOnce()
    assert(s.failed === Seq(ghost))
    assert(s.processed.size === 1) // the healthy file still went through
    val rec = ledger.all()(ghost)
    assert(rec.status === FileStatus.Failed)
    assert(rec.errorMessage.nonEmpty)
    // retry path: FAILED → NEW, appears in the next work list
    assert(p.retryFailed() === Seq(ghost))
    assert(ledger.newFiles() === Seq(ghost))
  }

  test("retry after a post-raw-write failure does not duplicate raw or clean rows") {
    val rawDir = tmpDir("raw")
    val fixture = Files.list(Paths.get(fixturesDir)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".csv"))
      .minBy(_.getFileName.toString)
    val name = fixture.getFileName.toString
    Files.copy(fixture, Paths.get(rawDir, name))
    val ledger = new JsonlControlStore(s"${tmpDir("ledger")}/file_log.jsonl")
    val rawSink = tmpDir("rawsink")

    // inject a failure AFTER the raw write: the clean "directory" is a
    // plain file, so the raw parquet stages but the CSV export throws
    val brokenCleanDir = Paths.get(tmpDir("cleanparent"), "cleanfile")
    Files.writeString(brokenCleanDir, "not a directory")
    val p1 = new StagingPipeline(spark, rawDir, rawSink,
      brokenCleanDir.toString, ledger)
    val s1 = p1.runOnce()
    assert(s1.failed === Seq(name))
    assert(ledger.all()(name).status === FileStatus.Failed)
    val rawRowsAfterFailure = p1.rawStaged().count()
    assert(rawRowsAfterFailure > 0) // raw-first: rows staged before the crash

    // operator fixes the config; next tick retries: raw must be
    // REPLACED, not appended
    val p2 = new StagingPipeline(spark, rawDir, rawSink, tmpDir("clean"), ledger)
    assert(p2.retryFailed() === Seq(name))
    val s2 = p2.runOnce()
    assert(s2.processed === Seq(name) && s2.failed.isEmpty)
    assert(p2.rawStaged().count() === rawRowsAfterFailure,
      "retry duplicated the raw staging rows")
    val rec = ledger.all()(name)
    assert(rec.status === FileStatus.CleanExported)
    assert(rec.rowCount === p2.cleanStaged().count())
  }

  test("reclaimProcessing re-queues crash-stranded files; a re-run completes them") {
    val (p, ledger, _) = setup(copy = 2)
    p.runOnce()
    val names = ledger.all().keys.toSeq.sorted
    // simulate a driver killed mid-file: force one back to PROCESSING
    ledger.update(names.head, FileStatus.Processing)
    assert(p.runOnce().processed.isEmpty, "PROCESSING is invisible to runOnce")
    assert(p.retryFailed().isEmpty, "and to retryFailed")
    assert(p.reclaimProcessing() === Seq(names.head))
    val again = p.runOnce()
    assert(again.processed === Seq(names.head),
      "the reclaimed file re-processes to completion")
    assert(ledger.all()(names.head).status === FileStatus.CleanExported)
  }
}
