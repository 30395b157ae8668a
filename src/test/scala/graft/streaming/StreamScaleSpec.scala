package graft.streaming

import graft.{SparkTestBase, StreamScaleBench}
import org.apache.spark.sql.functions.col

/** Bounded-state contract for every stateful op StreamScaleBench
  * measures (round-11 verdict item 5): the committed STREAM_SCALE.json
  * shows the plateau at sfg scale; this spec makes the plateau a RED
  * TEST at sf0.01 — through exactly the same harness seam
  * ([[StreamScaleBench.runOp]]) — so a lost watermark, a
  * forgotten-eviction regression, or an accidentally unbounded key
  * space fails in CI rather than surfacing as an artifact diff a
  * round later. `StreamScaleRocksDBSpec` re-runs the whole suite
  * under the RocksDB provider (the sfg artifact's configuration).
  *
  * The pinned property: once the watermark horizon has filled
  * (mid-drain), state must NOT keep growing with drained input. An
  * unbounded-state defect shows state ≈ cumulative input, i.e. the
  * late-drain peak ≈ 2× the mid-drain peak on this uniform replay —
  * the 1.6× + 64-row bound rejects that while tolerating batch-grain
  * jitter and small-state noise. Throughput and state bytes are
  * RECORDED in the artifact but deliberately not ratio-pinned here:
  * rows/sec is host-dependent and RocksDB memory moves with
  * compaction timing, so pinning either would make the suite flaky
  * without catching a defect class the row plateau misses.
  */
class StreamScaleSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"
  // 24 files / maxFilesPerTrigger(2) = 12 batches: enough drain
  // granularity for distinct mid([25%,50%)) and late([75%,100%])
  // windows of ≥3 batches each
  private val nFiles = 24

  private def plateauCheck(name: String, s: StreamScaleBench.OpStats,
      requireEviction: Boolean = true): Unit = {
    assert(s.batches >= 8, s"$name: drain too coarse for a plateau " +
      s"check (${s.batches} batches) — raise nFiles")
    val b = s.stateRowsByBatch
    val mid = b.slice(b.size / 4, b.size / 2)
    val late = b.drop(b.size * 3 / 4)
    val peakMid = mid.foldLeft(0L)(math.max)
    val peakLate = late.foldLeft(0L)(math.max)
    assert(peakLate <= (1.6 * peakMid).toLong + 64,
      s"$name: state grew past mid-drain (mid peak $peakMid, late peak " +
        s"$peakLate, by-batch $b) — watermark eviction regressed")
    if (requireEviction)
      assert(s.stateRemovedTotal > 0,
        s"$name: no state was ever evicted across the drain — the " +
          s"watermark horizon is not bounding state")
    assert(s.peakStateRows > 0 && s.rowsPerSec > 0,
      s"$name: harness broke (no state or no throughput measured): $s")
  }

  private def run(name: String): StreamScaleBench.OpStats =
    StreamScaleBench.runOp(spark, sfDir, name,
      tmpDir(s"stream_scale_$name"), nFiles)._2

  test("neardup: state bounded by the watermark horizon, not input") {
    val s = run("neardup")
    assert(s.rowsInTotal == 500, s"must drain all 500 docs: $s")
    plateauCheck("neardup", s)
  }

  test("chunk_dedup: state bounded by the watermark horizon, not input") {
    val s = run("chunk_dedup")
    assert(s.rowsInTotal == 500, s"must drain all 500 docs: $s")
    plateauCheck("chunk_dedup", s)
  }

  test("heavy_hitters: state bounded by live windows, not event history") {
    val s = run("heavy_hitters")
    assert(s.rowsInTotal == 10000, s"must drain all 10k events: $s")
    plateauCheck("heavy_hitters", s)
  }

  test("interval_join: buffered rows bounded by the join window") {
    val s = run("interval_join")
    // views (all 10k events) + the deterministic 1-in-5 purchase side
    assert(s.rowsInTotal > 10000, s"must drain both sides: $s")
    plateauCheck("interval_join", s)
  }

  test("sessionize: state is open sessions only, sealed ones leave") {
    val s = run("sessionize")
    assert(s.rowsInTotal == 10000, s"must drain all 10k events: $s")
    plateauCheck("sessionize", s)
  }

  // ---- round-13 additions: the remaining stateful families ----

  test("exact_dedup: hash-set state bounded by the watermark horizon") {
    val s = run("exact_dedup")
    assert(s.rowsInTotal == 500, s"must drain all 500 docs: $s")
    plateauCheck("exact_dedup", s)
  }

  test("attribution: touch state evicted at touch + horizon") {
    val s = run("attribution")
    assert(s.rowsInTotal == 10000, s"must drain all 10k events: $s")
    plateauCheck("attribution", s)
  }

  test("anomaly: window-count state bounded by live windows") {
    val s = run("anomaly")
    assert(s.rowsInTotal == 10000, s"must drain all 10k events: $s")
    plateauCheck("anomaly", s)
  }

  test("triples: one bounded buffer row per active key, plateau holds") {
    // state ROWS here are per-user Buffer rows: the emitted trigram
    // prefix is dropped INSIDE the row (merged.drop(k)) and a user's
    // row only disappears if its buffer fully empties — so
    // numRowsRemoved is structurally 0 and the eviction assert does
    // not apply; the bounds that do are the row plateau (keys
    // saturate) and the exact key census.
    val s = run("triples")
    assert(s.rowsInTotal == 10000, s"must drain all 10k events: $s")
    plateauCheck("triples", s, requireEviction = false)
    val users = graft.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull)
      .select("user_id").distinct().count()
    assert(s.endStateRows <= users,
      s"triples state can hold at most one buffer row per key " +
        s"($users); got $s")
  }

  test("upsert: state is exactly the distinct-key census, never evicted") {
    // the ONE family whose bound is key cardinality, not the
    // watermark (NoTimeout latest-wins — the op scaladoc's documented
    // deviation): state must equal the number of distinct users seen,
    // and nothing may ever be evicted. The unbounded-state smell the
    // plateau check hunts is this op's CONTRACT, so the pin here is
    // the exact census instead.
    val s = run("upsert")
    assert(s.rowsInTotal == 10000, s"must drain all 10k events: $s")
    val users = graft.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull && col("value").isNotNull)
      .select("user_id").distinct().count()
    assert(s.endStateRows == users,
      s"upsert state must be one row per distinct key ($users); got $s")
    assert(s.stateRemovedTotal == 0,
      s"latest-wins state must never be evicted; got $s")
    assert(s.peakStateRows == s.endStateRows,
      s"upsert state is monotone to the key census; got $s")
  }
}
