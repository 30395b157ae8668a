package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** [[StreamingUpsert]] on Spark 4's `transformWithState` — the
  * StatefulProcessor API that supersedes `flatMapGroupsWithState`
  * (SPIP: arbitrary stateful processing v2). Same latest-wins CDC
  * semantics, pinned ≡ the fMGWS twin by `StreamingUpsertTwsSpec`;
  * the API differences are what matter at warehouse scale:
  *
  *   - state lives in NAMED, individually-encoded slots
  *     ([[ValueState]] here; List/Map state for shapes fMGWS forces
  *     into one monolithic case class), each a RocksDB column family
  *     — a snapshot upsert table beside, say, a retention ListState
  *     without re-serializing the union of both on every touch;
  *   - TTL is declarative per state slot ([[TTLConfig]]; NONE here —
  *     a materialized table's state is O(live keys) by definition,
  *     the documented StreamingUpsert deviation), so bounded-state
  *     operators stop hand-rolling timeout bookkeeping;
  *   - timers are first-class (`handleExpiredTimer`) rather than one
  *     implicit timeout per key.
  *
  * The runtime requires the RocksDB state store provider — the spec
  * sets it; production sessions at scale run RocksDB anyway (the
  * HDFS-backed map provider holds every key on-heap). */
object StreamingUpsertTws {

  /** Latest-wins fold, one [[UpsertState]] per key. The fold itself
    * is [[StreamingUpsert.fold]] — the twins share one copy of the
    * tie rule and emission condition (the FlightSessions.merge
    * discipline), so this class owns only the state-slot plumbing. */
  private class UpsertProcessor
      extends StatefulProcessor[Long, AttrEvent, UpsertRow] {
    @transient private var cur: ValueState[UpsertState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[UpsertState](
        "latest", Encoders.product[UpsertState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[AttrEvent],
        timerValues: TimerValues): Iterator[UpsertRow] = {
      val prev = if (cur.exists()) Some(cur.get()) else None
      StreamingUpsert.fold(prev, rows) match {
        case Some(c) =>
          cur.update(c)
          Iterator.single(
            UpsertRow(uid, c.event_id, c.event_type, c.us, c.cents))
        case None => Iterator.empty
      }
    }
  }

  /** Fold a change stream into latest-wins emissions — the
    * `transformWithState` twin of [[StreamingUpsert.latest]] (same
    * input contract, same output rows). */
  def latest(events: DataFrame): Dataset[UpsertRow] = {
    import events.sparkSession.implicits._
    val typed = StreamingAttribution.typedEvents(events)
    typed.groupByKey(_.user_id)
      .transformWithState(new UpsertProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
