package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** A verified near-dup pair surfaced by the stream; `band` names the
  * LSH band that caught it (the same pair may surface from several
  * bands — at-least-once per pair; a downstream `dropDuplicates` on
  * (doc_a, doc_b) is the exactly-once step when one is needed). */
case class NearDupHit(doc_a: Long, doc_b: Long, j_milli: Long, band: Int)

/** One bucket-resident document inside the state store: id, sorted
  * 31-bit shingle hash set, set size, event time (ms). */
private[streaming] case class BucketDoc(
    docId: Long, hs: Array[Int], n: Long, tsMs: Long)

/** Streaming MinHash-LSH near-dup detection — q28's semantics at
  * ingest time, with watermark-bounded state (the same horizon
  * contract as [[StreamingDedup]]: a firehose cannot hold all history,
  * so "near-dup within a time horizon" is the streaming product, and
  * the batch q28 remains the exact global backstop).
  *
  * Shape: the stateless q28 signature pipeline ([[Dedup.bandRows]])
  * runs per row; state is keyed on the LSH (band, key) bucket and
  * holds only that bucket's in-horizon documents (compact int hash
  * sets, ~1 KB each); a new arrival is verified — exact sorted-merge
  * Jaccard, the same arithmetic as batch — against its bucket's
  * residents only. Never all-pairs, never cross-bucket: per-arrival
  * work is O(bucket), and `maxBucketDocs` caps a degenerate hot
  * bucket exactly like the batch side's LshSkew cap (beyond the cap a
  * new doc still verifies against residents but is not retained —
  * documented truncation, mirroring `spark.graft.lsh.maxBucket`).
  * Event-time timeouts evict whole buckets once the watermark passes
  * their newest member + horizon. */
object StreamingNearDup {

  /** Exact |A∩B| over ascending-sorted int arrays — the plain-Scala
    * twin of the codegen'd SortedIntersectCount kernel (pinned equal
    * by a ScalaCheck differential and the streamed-vs-batch spec). */
  private[streaming] def sortedIntersect(a: Array[Int], b: Array[Int]): Long = {
    var i = 0; var j = 0; var c = 0L
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  def minhashPairsStream(docs: DataFrame, eventTimeCol: String,
      horizonMinutes: Int, maxBucketDocs: Int = 64): Dataset[NearDupHit] = {
    require(maxBucketDocs >= 1, "a bucket must retain at least one doc")
    val s = docs.sparkSession
    import s.implicits._
    val horizonMs = horizonMinutes * 60000L

    // the event-time column must reach the stateful operator with its
    // watermark tag intact: a plain alias keeps the metadata, a cast
    // would strip it ("Watermark must be specified" at analysis)
    val rows = Dedup.bandRows(
        docs.withWatermark(eventTimeCol, s"$horizonMinutes minutes"),
        Seq(eventTimeCol))
      .select(col("band"), col("key"), col("doc_id"), col("hs"), col("n"),
        col(eventTimeCol).as("ts"))
      .as[(Int, Long, Long, Array[Int], Long, java.sql.Timestamp)]

    rows.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[List[BucketDoc], NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, it, state: GroupState[List[BucketDoc]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cur = state.getOption.getOrElse(Nil)
            val hits = List.newBuilder[NearDupHit]
            // deterministic intra-batch order: event time, then id
            it.toList.sortBy(r => (r._6.getTime, r._3)).foreach { r =>
              val band = r._1
              val nd = BucketDoc(r._3, r._4, r._5, r._6.getTime)
              cur.foreach { o =>
                if (o.docId != nd.docId) {
                  val inter = sortedIntersect(o.hs, nd.hs)
                  val union = o.n + nd.n - inter
                  val j = math.round(1000.0 * inter / union)
                  if (j >= Dedup.JMilliMin)
                    hits += NearDupHit(math.min(o.docId, nd.docId),
                      math.max(o.docId, nd.docId), j, band)
                }
              }
              // one slot per RESIDENT doc id: a re-delivered doc (the
              // duplicate firehose this module exists for) refreshes
              // its timestamp instead of occupying a second cap slot
              // and double-emitting every future hit in this bucket
              cur.indexWhere(_.docId == nd.docId) match {
                case -1 => if (cur.size < maxBucketDocs) cur = cur :+ nd
                case i => cur = cur.updated(i, nd)
              }
            }
            state.update(cur)
            // Clamp above the current watermark: an at-cap bucket never
            // appends, so its residents' max(ts)+horizon can be <= the
            // watermark by the time fresh data lands in the same trigger
            // — an un-clamped setTimeoutTimestamp then throws
            // IllegalArgumentException and poison-pills every restart.
            state.setTimeoutTimestamp(math.max(
              cur.map(_.tsMs).max + horizonMs + 1,
              state.getCurrentWatermarkMs() + 1))
            hits.result().iterator
          }
      }
  }
}
