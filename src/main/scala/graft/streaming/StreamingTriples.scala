package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-user event trigrams — the ingest-time half of q120
  * ([[graft.ops.Funnels.eventTriples]]'s census runs over the frames
  * this operator emits). `flatMapGroupsWithState` with a bounded
  * per-key buffer, SOUND under cross-batch reordering:
  *
  * A trigram is three CONSECUTIVE events in a user's event-time order
  * — so emitting (e₁,e₂,e₃) is only safe once no admissible row can
  * still land between e₁ and e₃. With watermark W, a late row is
  * admitted iff its event time ≥ W; therefore the triple is FINAL
  * exactly when its third event's time is < W (any insertion point
  * would be < t₃ < W — inadmissible). The state keeps only the events
  * at positions after the last emitted trigram start — watermark-
  * horizon-bounded, like [[FlightSessions]]' open-session list — and
  * the start event is evicted atomically with its emission, which is
  * what makes the emission exactly-once across micro-batches.
  *
  * The naive "append to last-2 state in arrival order" version is
  * UNSOUND: an in-horizon straggler landing between two buffered
  * events would silently produce a trigram the batch mirror never
  * contains ([[StreamingTriplesSpec]] constructs exactly that case).
  *
  * Scale shape: keys shard by groupByKey hash; per-key work is the
  * batch slice sort + an O(buffer) merge; state is O(events inside
  * the watermark horizon) per key. */
object StreamingTriples {

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String)
  final case class Buffer(evs: List[Ev])
  final case class Trigram(user_id: Long, e1: String, e2: String, e3: String,
      first_us: Long)

  def triplesStream(events: DataFrame, watermark: String = "1 hour")
      : Dataset[Trigram] = {
    val s = events.sparkSession
    import s.implicits._

    def fn(uid: Long, rows: Iterator[Ev],
        state: GroupState[Buffer]): Iterator[Trigram] = {
      // event-time total order — (ts, event_id), q120's tie-break.
      // Micros via the shared FlightSessions.us (a call to an object
      // method compiles to a static MODULE$ access, not a captured
      // reference — no serialization cost, and one copy of the
      // sub-millisecond rule).
      def key(e: Ev): (Long, Long) = (FlightSessions.us(e.ts), e.event_id)
      val merged = (state.getOption.map(_.evs).getOrElse(Nil) ++ rows)
        .sortBy(key).toArray
      // watermark in millis; an event is FINAL-third when its whole
      // millisecond is below W (admissible rows have event time ≥ W,
      // and timestamps inside one ms still compare < the next ms)
      val wm = state.getCurrentWatermarkMs()
      var k = 0
      val out = List.newBuilder[Trigram]
      while (k + 2 < merged.length && merged(k + 2).ts.getTime < wm) {
        out += Trigram(uid, merged(k).event_type, merged(k + 1).event_type,
          merged(k + 2).event_type, FlightSessions.us(merged(k).ts))
        k += 1
      }
      val rest = merged.drop(k).toList
      if (rest.isEmpty) state.remove()
      else {
        state.update(Buffer(rest))
        // wake when the watermark passes the oldest pending triple's
        // third event, so completion never waits for new rows
        if (rest.length >= 3)
          state.setTimeoutTimestamp(rest(2).ts.getTime + 1L)
      }
      out.result().iterator
    }

    // poison-record guard (see StreamingAttribution.wellFormed): a
    // null key/ts/id row would kill the query at the Ev encoder.
    // `value` is not consumed here, so only the used fields gate.
    events
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .selectExpr("user_id", "event_id", "ts", "event_type")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
