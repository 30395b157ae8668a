package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream interval join — the always-on form of q41's batch
  * attribution (`graft.ops.RangeJoin`): match each purchase to the
  * same user's views inside the preceding attribution window, with
  * BOTH sides arriving as streams.
  *
  * Spark's stream–stream join keeps both inputs in keyed state; the
  * join is only scale-safe when the condition bounds each side's
  * event time relative to the other, so the engine can compute a
  * state-eviction horizon from the watermarks instead of buffering
  * forever. That is exactly the interval predicate here:
  *
  *   view.user_id = purchase.user_id AND
  *   purchase_ts  ∈ (view_ts, view_ts + window]
  *
  * gives the engine "a view is joinable only until watermark passes
  * view_ts + window" — per-key state is the in-horizon rows, the
  * streaming analogue of the batch rewrite's ≤2-bin fan-out (state
  * and candidates both scale with window density, never history).
  *
  * Inner join: a purchase with no in-window view emits nothing (the
  * batch mirror's semantics for unmatched views), so append mode is
  * exact once the watermark closes the window. `StreamingJoinSpec`
  * pins streamed ≡ batch interval join on the drained data.
  */
object StreamingJoin {

  /** `views` and `purchases` are streaming frames with columns
    * (user_id, view_id, view_ts) / (user_id, purchase_id,
    * purchase_ts). Returns one row per (view, purchase) match. */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      watermark: String, windowMinutes: Int): DataFrame = {
    val v = views.withWatermark("view_ts", watermark)
    val p = purchases.withWatermark("purchase_ts", watermark)
    v.join(p,
      v("user_id") === p("user_id") &&
        p("purchase_ts") > v("view_ts") &&
        p("purchase_ts") <=
          v("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(v("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"))
  }
}
