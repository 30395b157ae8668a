package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** [[FlightSessions.sessionsStream]] on Spark 4's
  * `transformWithState` — the second StatefulProcessor port, chosen
  * because sessionization exercises the TWO capabilities the upsert
  * twin ([[StreamingUpsertTws]]) doesn't:
  *
  *   - **ListState**: the open-session set is a real list slot
  *     (appendable, individually encoded) instead of fMGWS's
  *     one-case-class-wraps-a-List workaround;
  *   - **first-class event-time timers**: session sealing on
  *     watermark passage uses `registerTimer` +
  *     [[handleExpiredTimer]] — fMGWS's single implicit per-key
  *     timeout, generalized. A key can hold several timers; this
  *     operator registers the earliest pending close and relies on
  *     idempotent sealing (a spurious wake seals nothing and
  *     re-registers), so stale timers from earlier batches are
  *     harmless rather than book-kept.
  *
  * Semantics are IDENTICAL to the fMGWS form (merge/bridge within
  * gap on either side; emit only once the watermark passes
  * `end + gap`): `FlightSessionsTwsSpec` pins emission-equality on
  * the out-of-order bridging fixture and the stream ⊆ batch
  * invariant on real data. Runs under the RocksDB state store
  * provider (required by transformWithState). */
object FlightSessionsTws {

  import FlightSessions.{StateRow, OpenSession, FlightSession, us, merge}

  private class SessionProcessor(gapMinutes: Int)
      extends StatefulProcessor[String, StateRow, FlightSession] {
    private val gapMs = gapMinutes * 60000L
    private val gapUs = gapMinutes * 60000000L
    @transient private var open: ListState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    /** Emit sessions the watermark has sealed (`wm ≥ end + gap + 1`),
      * store the remainder, (re)arm the timer for the earliest pending
      * close. Idempotent: with nothing sealed it emits nothing and
      * leaves state equivalent. */
    private def seal(key: String, sess: List[OpenSession],
        wm: Long): Iterator[FlightSession] = {
      val (sealed_, stillOpen) =
        sess.partition(o => o.end.getTime + gapMs + 1L <= wm)
      if (stillOpen.isEmpty) open.clear()
      else {
        open.put(stillOpen.toArray)
        getHandle.registerTimer(stillOpen.map(_.end.getTime + gapMs + 1L).min)
      }
      sealed_.sortBy(o => us(o.start))
        .map(o => FlightSession(key, o.start, o.end, o.n)).iterator
    }

    override def handleInputRows(key: String, rows: Iterator[StateRow],
        timerValues: TimerValues): Iterator[FlightSession] = {
      var sess: List[OpenSession] =
        if (open.exists()) open.get().toList else Nil
      rows.toArray.sortBy(r => us(r.ts)).foreach { r =>
        // the shared FlightSessions.merge IS the sessionization
        // semantics — both twins fold through the same code
        sess = merge(sess, r.ts, gapUs)
      }
      seal(key, sess, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[FlightSession] =
      seal(key,
        if (open.exists()) open.get().toList else Nil,
        timerValues.getCurrentWatermarkInMs())
  }

  def sessionsStream(clean: DataFrame, gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[FlightSession] = {
    val s = clean.sparkSession
    import s.implicits._
    clean
      .filter(col("icao24").isNotNull && col("time_position").isNotNull)
      .select(col("icao24"), col("time_position").as("ts"))
      .as[StateRow]
      .withWatermark("ts", watermark)
      .groupByKey(_.icao24)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
