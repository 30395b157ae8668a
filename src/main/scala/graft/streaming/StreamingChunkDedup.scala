package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming chunk-level dedup — the ingest-time half of the
  * paragraph-dedup cascade (batch-global first-occurrence dedup is
  * `graft.ops.CorpusPrep.paragraphDedup`, q94).
  *
  * The stateless CDC chunker (`CorpusPrep.chunkExplode` — the same
  * per-row kernel q94 runs) explodes each arriving document into
  * chunks; `dropDuplicatesWithinWatermark` on the chunk hash then
  * keeps one surviving instance per chunk within the watermark
  * horizon. Same state contract as [[StreamingDedup]]: state is
  * (distinct chunks inside the horizon), never all chunks ever; a
  * duplicate arriving after eviction re-emits, and the batch q94 is
  * the exact corpus-wide backstop.
  *
  * The output is the surviving CHUNK stream (all input columns + pos /
  * chunk / chunk_hash) rather than re-assembled documents: streaming
  * keeps arrival-order winners, and re-assembly is a downstream
  * grouping the consumer applies per doc_id if it wants documents —
  * emitting chunks keeps this operator append-mode with one stateful
  * stage. */
object StreamingChunkDedup {

  /** Append-mode chunk dedup of `docs` (a streaming DataFrame with
    * `text` and an event-time column): one surviving instance per
    * chunk hash within the watermark horizon. */
  def chunkDedupStream(docs: DataFrame, eventTimeCol: String,
      watermark: String): DataFrame =
    graft.ops.CorpusPrep.chunkExplode(docs)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("chunk_hash")
}
