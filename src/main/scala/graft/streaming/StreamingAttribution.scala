package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The last non-purchase touch a user's timeline is currently holding:
  * what an in-horizon purchase will be credited to. */
case class TouchState(channel: String, us: Long)

/** One attributed purchase: the stream's output row. */
case class AttributedPurchase(user_id: Long, event_id: Long,
    channel: String, cents: Long)

/** Event row as the stateful operator consumes it. `ts` carries the
  * watermark tag through to the stateful operator (the event-time
  * timeout checker requires the watermarked attribute in its input);
  * the logic itself uses the exact `us` micros. */
case class AttrEvent(user_id: Long, event_id: Long, event_type: String,
    us: Long, cents: Long, ts: java.sql.Timestamp)

/** Streaming last-touch attribution — the ingest-time half of q148
  * (`graft.ops.Temporal.lastTouchAttribution`): every purchase is
  * credited the moment it arrives, to the user's most recent
  * non-purchase touch within the horizon, or `direct`.
  *
  * This is the per-key VALUE-state pattern the rest of the streaming
  * surface doesn't cover (dedup keys sets, sessions key windows,
  * heavy-hitters keys counts): `flatMapGroupsWithState` holding ONE
  * tiny record per user — the last touch — with EVENT-TIME eviction:
  * a touch older than `watermark − horizon` can never be inside the
  * horizon of any future purchase (purch. time ≥ watermark), so its
  * state times out and is removed. State is O(active users in
  * horizon) × ~32 bytes, independent of history length.
  *
  * Ordering contract (the StreamingDedup discipline): events are
  * applied in (us, event_id) order WITHIN each micro-batch — so the
  * q148 tie rule (same-microsecond touch with smaller id precedes the
  * purchase) holds exactly — and in ARRIVAL order across batches; a
  * touch arriving after the purchase it should have preceded is the
  * late-data case the watermark bounds and the batch q148 pass
  * settles. `StreamingAttributionSpec` pins stream ≡ batch on
  * event-time-ordered feeds.
  */
object StreamingAttribution {

  /** Quarantine filter shared by the typed stateful operators: a row
    * missing any field the operator's state logic requires would kill
    * the QUERY at the encoder (`Null value appeared in non-nullable
    * field`) — for a 24/7 ingest stream one poison record must not
    * take down the pipeline (the FlightSessions discipline). Excluded
    * rows are outside every operator's contract (no key to group on,
    * no event time to order by); at scale the production deployment
    * routes `NOT wellFormed` to a dead-letter sink instead of
    * dropping. `event_type` stays nullable — String fields encode
    * null fine and the operators treat unknown types as non-matches. */
  private[streaming] def wellFormed(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull && col("event_id").isNotNull &&
      col("ts").isNotNull && col("value").isNotNull)

  /** Attribute a purchase stream. `events` needs columns (user_id,
    * event_id, event_type, ts, value); emits one append-mode row per
    * purchase. */
  def attribute(events: DataFrame, watermark: String,
      horizonMicros: Long = graft.ops.Temporal.AttributionHorizonMicros)
      : Dataset[AttributedPurchase] = {
    import events.sparkSession.implicits._
    val typed = wellFormed(events)
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"),
        col("ts"))
      .as[AttrEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttributedPurchase](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[AttrEvent],
         state: GroupState[TouchState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = rows.toSeq.sortBy(r => (r.us, r.event_id))
            var touch = state.getOption
            val out = Seq.newBuilder[AttributedPurchase]
            ordered.foreach { r =>
              if (r.event_type == "purchase") {
                val ch = touch
                  .filter(t => r.us - t.us <= horizonMicros)
                  .map(_.channel).getOrElse("direct")
                out += AttributedPurchase(uid, r.event_id, ch, r.cents)
              } else touch = Some(TouchState(r.event_type, r.us))
            }
            touch match {
              case Some(t) =>
                state.update(t)
                // dead once the watermark passes touch + horizon; the
                // +1s guards the "timeout ≤ current watermark" check
                val deadline = t.us / 1000L + horizonMicros / 1000L
                state.setTimeoutTimestamp(
                  math.max(deadline, state.getCurrentWatermarkMs() + 1000L))
              case None => ()
            }
            out.result().iterator
          }
      }
  }
}
