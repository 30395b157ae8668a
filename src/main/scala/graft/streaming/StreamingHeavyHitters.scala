package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming hot-key monitor — the ingest-time half of the heavy
  * hitters family (batch-global count-min + exact table is
  * `graft.ops.HeavyHitters`, q71).
  *
  * A firehose can't keep all-history counts (state grows with the key
  * space forever); the standard contract is per-window frequencies
  * with watermark-bounded state: tumbling event-time windows, one
  * count per (window, key), state evicted as the watermark passes.
  * Append mode means a window's counts emit exactly once, when it
  * closes — so a CLOSED window's output is final and equals the batch
  * `groupBy` of the same rows, which is what
  * `StreamingHeavyHittersSpec` pins (the StreamingDedup ≡ q44
  * pattern).
  *
  * Two surfaces, mirroring the batch pair:
  *   - [[hotKeys]]: exact per-window counts, threshold-filtered. State
  *     is (windows in horizon) × (distinct keys in window) — bounded
  *     by the horizon, exact within it.
  *   - [[windowSketch]]: the same [[graft.ops.HeavyHitters]] count-min
  *     grid per window via `CountMinAgg` — state per window is the
  *     constant 16 KiB grid REGARDLESS of key cardinality, the
  *     sub-linear path when even in-horizon distinct keys blow the
  *     state store (grid merge is vector addition, so partial
  *     aggregation and state-store merges compose exactly; the
  *     emitted grid is bit-identical to the batch aggregate of the
  *     same rows).
  */
object StreamingHeavyHitters {

  /** Exact per-window hot keys: count per (window, key) ≥ `minCount`,
    * emitted once per closed window. `keyCol` is a Column (like
    * [[windowSketch]]'s) so escalating between the two surfaces — or
    * keying on an expression — changes no call shape. */
  def hotKeys(events: DataFrame, eventTimeCol: String, keyCol: Column,
      windowLen: String, watermark: String, minCount: Long): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLen).as("w"),
        keyCol.as("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("w.start").as("window_start"), col("key"), col("cnt"))

  /** Constant-state per-window count-min grid (q71's geometry). */
  def windowSketch(events: DataFrame, eventTimeCol: String, keyCol: Column,
      windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLen).as("w"))
      .agg(graft.functions.ArrayFunctions.countMinSketch(keyCol,
        graft.ops.HeavyHitters.CmDepth, graft.ops.HeavyHitters.CmWidth)
        .as("cm"))
      .select(col("w.start").as("window_start"), col("cm"))
}
