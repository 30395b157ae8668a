package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming volume-anomaly monitor — the ingest-time half of the
  * EWMA family (batch forecast is `graft.ops.Temporal` q146).
  *
  * The production split is lambda-shaped on purpose: the FORECAST
  * needs a long, ordered history (7 closed periods per key), which is
  * exactly what a batch pass over the warehouse computes cheaply and
  * a firehose state store should not hold; the STREAM's job is the
  * part that can't wait — count the open window and score it against
  * the published baseline the moment the window closes. So:
  *
  *   - one stateful operator: the tumbling event-time window count,
  *     watermark-bounded, append mode (a window's count emits exactly
  *     once, when it closes — the StreamingHeavyHitters contract);
  *   - the baseline is a STATIC (key, pred) frame joined broadcast —
  *     stream-static joins are stateless, so state stays
  *     (windows in horizon) × (keys), independent of history length;
  *   - deviation is q146's integer milli rule, identical CASE
  *     semantics, so a closed window's flag equals the batch flag
  *     computed from the same rows and the same baseline
  *     (`StreamingAnomalySpec` pins it);
  *   - a key the baseline has never seen is an anomaly BY DEFINITION
  *     (dev_milli NULL, flag 1) — new-event-type detection for free.
  */
object StreamingAnomaly {

  /** Closed-window counts per key, scored against `baseline`
    * (columns: key, pred). Emits one row per (closed window, key):
    * window_start, key, n_events, pred, dev_milli, is_anomaly. */
  def monitor(events: DataFrame, eventTimeCol: String, keyCol: Column,
      windowLen: String, watermark: String, baseline: DataFrame,
      anomalyMilli: Long = graft.ops.Temporal.AnomalyMilli): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLen).as("w"),
        keyCol.as("key"))
      .agg(count(lit(1)).as("n_events"))
      .join(broadcast(baseline), Seq("key"), "left")
      .select(col("w.start").as("window_start"), col("key"),
        col("n_events"), col("pred"),
        when(col("pred").isNotNull,
          expr("(n_events - pred) * 1000 div greatest(pred, 1L)"))
          .as("dev_milli"))
      .withColumn("is_anomaly",
        when(col("dev_milli").isNull, lit(1L))
          .otherwise((abs(col("dev_milli")) >= anomalyMilli).cast("long")))
}
