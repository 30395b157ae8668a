package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the ingest-time half of the dedup cascade
  * (batch-global exact dedup is `graft.ops.Dedup.exactDedup`, q44).
  *
  * A training-data firehose cannot dedup against all history (state
  * would grow with N forever); the standard contract is "drop
  * duplicates within a time horizon": content hash as the state key,
  * watermark-bounded state via `dropDuplicatesWithinWatermark`, so
  * per-executor state is (distinct contents inside the horizon), not
  * (all contents ever). A duplicate arriving after its original's
  * state was evicted re-emits — that is the documented trade-off, and
  * the downstream batch dedup (q44) remains the exact backstop.
  *
  * The per-row analysis ops (TextAnalysis stats/langid/fingerprint,
  * MultiModal metadata) are stateless projections and run on a stream
  * UNCHANGED — `StreamingDedupSpec` pins that for q25's kernel.
  */
object StreamingDedup {

  /** Append-mode dedup of `docs` (a streaming DataFrame): one survivor
    * per md5(text) within the watermark horizon over `eventTimeCol`.
    *
    * Null text gets a per-row random sentinel key instead of a null
    * hash: `dropDuplicatesWithinWatermark` compares null keys equal, so
    * md5(null)=null would collapse ALL null-text rows inside the
    * horizon to one survivor — distinct rows that merely lack text are
    * not duplicates of each other. (Content-null rows pass through;
    * dropping them is a policy the caller applies upstream if wanted.) */
  def exactDedupStream(docs: DataFrame, eventTimeCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("content_hash",
        coalesce(md5(col("text")), concat(lit("null:"), uuid())))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
