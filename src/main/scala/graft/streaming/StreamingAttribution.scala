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

  /** The typed [[AttrEvent]] projection shared by the attribution and
    * upsert operators: poison-guarded, exact event-time micros,
    * integer cents through `Det.cents` — the cross-engine rounding
    * rule kept in ONE place (the FlightSessions.us discipline; three
    * inline copies of the cents expression is how the rule drifts).
    * `ts` rides along so a caller can `withWatermark` on the typed
    * frame. */
  private[streaming] def typedEvents(events: DataFrame): Dataset[AttrEvent] = {
    import events.sparkSession.implicits._
    wellFormed(events)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        graft.ops.Det.cents(col("value")).cast("long").as("cents"),
        col("ts"))
      .as[AttrEvent]
  }

  /** Attribute a purchase stream. `events` needs columns (user_id,
    * event_id, event_type, ts, value); emits one append-mode row per
    * purchase. */
  def attribute(events: DataFrame, watermark: String,
      horizonMicros: Long = graft.ops.Temporal.AttributionHorizonMicros)
      : Dataset[AttributedPurchase] = {
    import events.sparkSession.implicits._
    val typed = typedEvents(events).withWatermark("ts", watermark)
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
              } else if (r.event_type != null)
                // a NULL-typed row is a no-op, matching batch q148:
                // its `when(event_type =!= "purchase", …)` is NULL
                // there too, and last(…, ignoreNulls) skips it — it
                // must neither become a null-channel touch nor shadow
                // the real one
                touch = Some(TouchState(r.event_type, r.us))
            }
            touch match {
              case Some(t) =>
                state.update(t)
                // dead once the watermark passes touch + horizon.
                // Sum BEFORE flooring to millis and add 1 (the
                // FlightSessions sub-millisecond rule): flooring t.us
                // and horizonMicros separately loses up to 999 µs
                // EACH, and an early timeout evicts state a still-
                // admissible edge-of-horizon purchase needs — late
                // eviction is always safe (batch has none), early
                // eviction diverges.
                val deadline = (t.us + horizonMicros) / 1000L + 1L
                state.setTimeoutTimestamp(
                  math.max(deadline, state.getCurrentWatermarkMs() + 1000L))
              case None => ()
            }
            out.result().iterator
          }
      }
  }
}
