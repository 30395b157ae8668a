package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream temporal operators: EWMA forecasting with anomaly
  * flags (q146), activity streaks (q147), last-touch revenue
  * attribution (q148), and top session paths (q149) — the monitoring
  * and product-analytics layer above q60/q107/q135's funnels.
  *
  * Cross-engine determinism: timestamps flow as epoch micros
  * (`unix_micros` / DuckDB `epoch_us`), days as DATE via
  * `date_trunc`, all rates in integer ppm/milli with truncating
  * division — the family's standard playbook.
  *
  * Scale design: every operator here shuffles on user or
  * (type, period) keys with map-side partial aggregation. Per-type
  * day series are O(types·days) — window work after the first census
  * is constant-sized. Nothing sorts globally except the q149 top-k
  * head (TakeOrdered on an O(|paths|) frame).
  */
object Temporal {

  // ---------------------------------------------------------------- q146
  /** Halving EWMA weights for lags 1..7 (64,32,…,1; denominator 127):
    * α=½ exponential decay in exact integer form. */
  val EwmaWeights: Seq[Long] = Seq(64L, 32L, 16L, 8L, 4L, 2L, 1L)

  /** Anomaly threshold: |deviation| ≥ 500 milli (±50% of forecast). */
  val AnomalyMilli = 500L

  /** q146: EWMA anomaly flags — per (event type, day): the day's
    * event count, a 7-observation exponentially-weighted forecast
    * (integer halving weights), the signed deviation in milli, and an
    * anomaly flag at ±[[AnomalyMilli]]. The standard volume monitor:
    * the EWMA absorbs drift, the deviation flags the incident.
    *
    * Forecast = Σ wᵢ·lagᵢ div Σ wᵢ over the previous 7 OBSERVED days
    * (rows, not calendar positions — a silent day simply doesn't
    * advance the window), emitted only once 7 lags exist. All
    * arithmetic is exact integer; deviation divides by
    * greatest(pred, 1) so a zero forecast can't divide by zero.
    *
    * Scale shape: one hash-agg shuffle to the (type, day) census —
    * map-side combine carries the weight — then lag windows over
    * O(types·days) rows partitioned by type. */
  def ewmaAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = EwmaWeights.zipWithIndex.foldLeft(
      daily.withColumn("rn", row_number().over(w))) { case (df, (_, i)) =>
      df.withColumn(s"l${i + 1}", lag(col("n_events"), i + 1).over(w))
    }
    val num = EwmaWeights.zipWithIndex
      .map { case (wgt, i) => s"$wgt * l${i + 1}" }.mkString(" + ")
    lagged
      .filter(col("rn") > EwmaWeights.size)
      .withColumn("pred", expr(s"($num) div ${EwmaWeights.sum}"))
      .withColumn("dev_milli",
        expr("(n_events - pred) * 1000 div greatest(pred, 1L)"))
      .select(col("event_type"), col("day"),
        col("n_events").cast("long").as("n_events"),
        col("pred").cast("long").as("pred"),
        col("dev_milli").cast("long").as("dev_milli"),
        (abs(col("dev_milli")) >= AnomalyMilli).cast("long").as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  // ---------------------------------------------------------------- q147
  /** q147: activity streaks — per user: active-day count, number of
    * maximal consecutive-day runs, and the longest run. The classic
    * gaps-and-islands census behind every engagement dashboard.
    *
    * Island id = day_number − row_number (constant within a
    * consecutive run, strictly monotone across gaps) over the
    * per-user distinct-day frame.
    *
    * Scale shape: distinct (user, day) is one hash-agg shuffle; the
    * window and both re-aggregations group by keys PREFIXED by
    * user_id, so the single user-keyed exchange serves all three
    * stages (islands are a user-local concept). */
  def activityStreaks(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")).cast("date"),
          lit("1970-01-01").cast("date")).as("dn"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("dn")
    days
      .withColumn("isl", col("dn") - row_number().over(w))
      .groupBy("user_id", "isl")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum("len").cast("long").as("n_active_days"),
        count(lit(1)).cast("long").as("n_streaks"),
        max("len").cast("long").as("longest_streak"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q148
  /** Attribution lookback horizon: 30 minutes of micros (the q20
    * session gap — a purchase is credited within its session). */
  val AttributionHorizonMicros = 1800000000L

  /** q148: last-touch revenue attribution — every purchase is
    * credited to the most recent PRECEDING non-purchase event of the
    * same user within [[AttributionHorizonMicros]]; purchases with no
    * in-horizon touch fall into the `direct` bucket. Per channel:
    * purchase count and exact revenue cents.
    *
    * The touch lookup is `last(..., ignoreNulls)` over the user
    * timeline frame `(unbounded, −1)` ordered by (us, event_id) —
    * ties at the same microsecond resolve to the larger event id in
    * both engines. No self-join: one window pass finds every
    * purchase's predecessor.
    *
    * Scale shape: one user-keyed exchange for the timeline window,
    * then a |channels|-sized hash agg. Revenue is per-row integer
    * cents (order-free exact sums). */
  def lastTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val touchUs = when(col("event_type") =!= "purchase", col("us"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("attr_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("attr_us", last(touchUs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("attr_us").isNotNull &&
          col("us") - col("attr_us") <= AttributionHorizonMicros,
          col("attr_type")).otherwise(lit("direct")).as("channel"),
        col("value"))
      .groupBy("channel")
      .agg(count(lit(1)).cast("long").as("n_purchases"),
        Det.lsum(Det.cents(col("value"))).as("revenue_cents"))
      .orderBy("channel")
  }

  // ---------------------------------------------------------------- q149
  /** Steps kept per session path and paths kept in the league table. */
  val PathSteps = 3
  val PathTopK = 20

  /** The sessionized event frame shared by q149/q154: per event its
    * session id (q20's 30-minute gap rule, running flag sum) and its
    * 1-based position within the session. One user-keyed exchange
    * serves the gap-flag window, the running sum, and the position
    * window (all partitionings prefixed by user_id). */
  private def sessionized(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > AttributionHorizonMicros, 1L).otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "sess_id").orderBy(col("us"), col("event_id"))))
  }

  /** q149: top session paths — sessionize (q20's 30-minute gap),
    * take each session's first [[PathSteps]] event types in arrival
    * order, and rank the most frequent paths. Funnel DISCOVERY: q60
    * checks a declared funnel, q120 counts raw trigrams anywhere in
    * the stream; this counts how sessions actually BEGIN.
    *
    * Path assembly sorts (rn, type) structs inside the group — the
    * collect is per-session (≤ [[PathSteps]] elements), never
    * corpus-wide. Rank ties break on the path string.
    *
    * Scale shape: one user-keyed exchange serves the session-flag
    * window, the running session-id sum, AND the per-(user, session)
    * path assembly (grouping keys prefixed by user_id); the path
    * census is a hash agg on the path string; the league table is a
    * TakeOrdered head. */
  def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    val paths = sessionized(s, dir)
      .filter(col("rn") <= PathSteps)
      .groupBy("user_id", "sess_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        p => p.getField("event_type")), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
    paths
      .orderBy(col("n_sessions").desc, col("path")).limit(PathTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))).cast("long"))
      .select(col("rank"), col("path"), col("n_sessions").cast("long").as("n_sessions"))
      .orderBy("rank")
  }

  // ---------------------------------------------------------------- q153
  /** q153: RFM feature export — the per-user feature row a churn /
    * LTV model trains on: recency (days since last event, against the
    * corpus's last day), frequency (events, distinct active days),
    * monetary (exact purchase cents), and the user's modal event type
    * (ties break alphabetically). The feature-store materialization
    * every product-ML pipeline runs nightly.
    *
    * Scale shape: two user-keyed aggregations (the flat rollup and
    * the modal-type rank) joined on user_id — the same exchange
    * serves the (user, type) census, its rank window and the join;
    * the corpus last-day is a 1-row broadcast (declared BNLJ). */
  def rfmFeatures(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"), col("value"))
    val corpusLast = e.agg(max("day").as("corpus_last_day"))
    val flat = e.groupBy("user_id").agg(
      max("day").as("last_day"),
      count(lit(1)).cast("long").as("n_events"),
      countDistinct("day").cast("long").as("n_active_days"),
      Det.lsum(when(col("event_type") === "purchase",
        Det.cents(col("value"))).otherwise(lit(0.0d))).as("revenue_cents"))
    val topType = e.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("trn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type"))))
      .filter(col("trn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"))
    flat.join(topType, "user_id")
      .crossJoin(broadcast(corpusLast))
      .select(col("user_id"),
        datediff(col("corpus_last_day"), col("last_day")).cast("long").as("recency_days"),
        col("n_events"), col("n_active_days"), col("revenue_cents"), col("top_type"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q154
  /** Session positions reported individually; deeper events pool into
    * the [[PosCap]] bucket. */
  val PosCap = 10

  /** q154: position-conversion profile — per within-session event
    * position (1..[[PosCap]], deeper pooled): event count, purchase
    * count, purchase rate ppm. The "how deep into a session do users
    * buy" curve that ranking and UI changes are judged against.
    *
    * Scale shape: the q149 sessionized frame (one user exchange),
    * then a ≤[[PosCap]]-key hash agg. */
  def positionConversion(s: SparkSession, dir: String): DataFrame =
    sessionized(s, dir)
      .select(least(col("rn"), lit(PosCap)).cast("long").as("position"),
        col("event_type"))
      .groupBy("position")
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum((col("event_type") === "purchase").cast("long")).cast("long")
          .as("n_purchases"))
      .withColumn("purchase_ppm",
        expr("n_purchases * 1000000 div n_events"))
      .orderBy("position")

  // ---------------------------------------------------------------- q159
  /** q159: linear multi-touch attribution — q148's last-touch
    * sibling: each purchase's exact cents split EQUALLY across every
    * non-purchase touch of the same user inside the horizon before it
    * (same (us, event_id) tie rule as q148), with the integer
    * remainder credited to the LATEST touch so every cent lands
    * exactly once — conservation is an arithmetic invariant, not a
    * rounding hope. Purchases with no in-horizon touch credit the
    * `direct` bucket whole.
    *
    * Per channel: credited rows and exact attributed cents.
    *
    * Scale shape: ONE user-keyed equi-join pairs purchases with their
    * candidate touches (the horizon predicate filters inside the
    * join; per-user row counts bound the pair fan-out); the share
    * split is two windows over the SAME purchase-id partitioning
    * (count + latest-touch rank — one exchange, two passes); the
    * direct bucket is a purchase-keyed anti-join; rollups are
    * |channels|-sized. */
  def linearAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("us").as("p_us"), Det.cents(col("value")).cast("long").as("cents"))
    val touches = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("channel"), col("us").as("t_us"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter((col("t_us") < col("p_us") ||
        (col("t_us") === col("p_us") && col("t_id") < col("p_id"))) &&
        col("p_us") - col("t_us") <= AttributionHorizonMicros)
    val wCnt = Window.partitionBy("p_id")
    val wRnk = Window.partitionBy("p_id")
      .orderBy(col("t_us").desc, col("t_id").desc)
    val credited = joined
      .withColumn("n_touch", count(lit(1)).over(wCnt))
      .withColumn("trn", row_number().over(wRnk))
      .select(col("channel"),
        expr("cents div n_touch + CASE WHEN trn = 1 THEN cents % n_touch ELSE 0L END")
          .as("share_cents"))
      .groupBy("channel")
      .agg(count(lit(1)).cast("long").as("n_credits"),
        sum("share_cents").cast("long").as("attributed_cents"))
    val direct = purchases
      .join(joined.select("p_id").distinct(), Seq("p_id"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_credits"),
        coalesce(sum("cents"), lit(0L)).cast("long").as("attributed_cents"))
      .select(lit("direct").as("channel"), col("n_credits"),
        col("attributed_cents"))
    credited.unionAll(direct).orderBy("channel")
  }

  // ---------------------------------------------------------------- q164
  /** Autocorrelation lags probed by the volume diagnostic. */
  val AcfLags: Seq[Int] = Seq(1, 7)

  /** q164: daily-volume autocorrelation — per (event type, lag ∈
    * [[AcfLags]]): the Pearson correlation between the daily count
    * series and itself k OBSERVED days back, in exact integer moment
    * sums with the single float op being the final sqrt (the cosMicro
    * / q163 discipline). Lag-1 ≈ trend persistence, lag-7 ≈ weekly
    * seasonality — the diagnostic that says whether q146's EWMA or
    * q123's weekday baseline is the right monitor for a series.
    *
    * Scale shape: the (type, day) census is the one data-sized hash
    * agg (q146's); every lag window and moment sum runs over the
    * bounded census. Pairs are (row, row−k) over observed days —
    * emitted only when the lag exists, per type and lag. */
  def volumeAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = AcfLags.foldLeft(daily) { (df, k) =>
      df.withColumn(s"l$k", lag(col("cnt"), k).over(w))
    }
    val perLag = AcfLags.map { k =>
      lagged.filter(col(s"l$k").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          Det.lsum(col("cnt")).as("sa"), Det.lsum(col(s"l$k")).as("sb"),
          sum(expr(s"CAST(cnt AS DECIMAL(38,0)) * cnt")).as("saa"),
          sum(expr(s"CAST(l$k AS DECIMAL(38,0)) * l$k")).as("sbb"),
          sum(expr(s"CAST(cnt AS DECIMAL(38,0)) * l$k")).as("sab"))
        .select(col("event_type"), lit(k.toLong).as("lag"),
          col("n_pairs"),
          expr("CAST(n_pairs * sab - CAST(sa AS DECIMAL(38,0)) * sb AS BIGINT)").as("num"),
          expr("CAST(n_pairs * saa - CAST(sa AS DECIMAL(38,0)) * sa AS BIGINT)").as("den_a"),
          expr("CAST(n_pairs * sbb - CAST(sb AS DECIMAL(38,0)) * sb AS BIGINT)").as("den_b"))
    }.reduce(_ unionAll _)
    perLag
      .withColumn("acf_milli",
        expr("""CASE WHEN den_a = 0 OR den_b = 0 THEN NULL
               |ELSE CAST(round(1000.0 * num /
               |  sqrt(CAST(den_a AS DOUBLE) * CAST(den_b AS DOUBLE))) AS BIGINT)
               |END""".stripMargin))
      .orderBy("event_type", "lag")
  }

  // ---------------------------------------------------------------- q165
  /** CUSUM: baseline window (first observed days), slack 5% of the
    * baseline, decision threshold 3× the baseline. */
  val CusumBaselineDays = 7
  val CusumSlackPct     = 5L
  val CusumThresholdX   = 3L

  /** q165: CUSUM mean-shift detection — per (event type, day) after a
    * [[CusumBaselineDays]]-day baseline window: the two-sided CUSUM
    * statistics and a shift flag once either side crosses
    * [[CusumThresholdX]]·baseline. The change-point monitor that
    * catches the SLOW drifts q146's per-day EWMA deviation absorbs:
    * CUSUM accumulates small same-signed deviations until the
    * evidence is undeniable.
    *
    * The textbook recursion S⁺_t = max(0, S⁺_{t-1} + x_t − μ − k) is
    * not a window function, but it has an exact closed form: with
    * d_t = x_t − μ − k and P_t = Σ_{i≤t} d_i,
    * S⁺_t = P_t − min(0, min_{j≤t} P_j) — a running sum minus a
    * running min, both plain windows. (Induction: subtracting the
    * historical low clips at exactly the points the max(0, ·) reset
    * would.) The negative side runs the same form on −deviations.
    * All arithmetic is exact integer: μ = sum div n over the baseline
    * window, k = μ·[[CusumSlackPct]] div 100.
    *
    * Scale shape: one (type, day) census hash agg, then every window
    * partitions by event_type over the bounded census — q146's
    * discipline. A 100-TB event stream still yields O(types·days)
    * census rows. */
  def cusumShift(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exact integer baseline: the conditional sum over the first
    // CusumBaselineDays observed rows is constant from row B onward
    val scored = daily
      .withColumn("rn", row_number().over(w))
      .withColumn("bsum",
        sum(when(col("rn") <= CusumBaselineDays, col("cnt"))).over(wAll))
      .filter(col("rn") > CusumBaselineDays)
      .withColumn("mu", expr(s"bsum div $CusumBaselineDays"))
      .withColumn("k", expr(s"mu * $CusumSlackPct div 100"))
      .withColumn("h", expr(s"greatest(mu, 1L) * $CusumThresholdX"))
      .withColumn("p_pos", sum(expr("cnt - mu - k")).over(wAll))
      .withColumn("p_neg", sum(expr("mu - cnt - k")).over(wAll))
      .withColumn("s_pos",
        col("p_pos") - least(lit(0L), min(col("p_pos")).over(wAll)))
      .withColumn("s_neg",
        col("p_neg") - least(lit(0L), min(col("p_neg")).over(wAll)))
    scored.select(col("event_type"), col("day"),
      col("cnt").cast("long").as("n_events"),
      col("mu").cast("long").as("baseline"),
      col("s_pos").cast("long").as("s_pos"),
      col("s_neg").cast("long").as("s_neg"),
      (col("s_pos") >= col("h") || col("s_neg") >= col("h"))
        .cast("long").as("is_shift"))
      .orderBy("event_type", "day")
  }

  // ---------------------------------------------------------------- q166
  /** Centered moving-average half-width: trend = 7-observation window. */
  val DecompHalf = 3

  /** q166: classical seasonal decomposition (STL-lite) — per
    * (event type, day): trend (centered 7-observation integer mean),
    * day-of-week seasonal (per-(type, dow) integer mean of the
    * detrended series), and the residual. The diagnostic q164's ACF
    * motivates: once lag-7 correlation is established, THIS is the
    * split into trend / weekly-pattern / anomaly that monitoring
    * dashboards plot.
    *
    * Determinism: day-of-week is day-number mod 7 (epoch days), not
    * an engine `dayofweek()` — Spark counts Sunday=1, DuckDB
    * Sunday=0, and the mod sidesteps both. Rows are emitted only
    * where the full centered window exists (rn ∈ [half+1, n−half]);
    * all three components are exact integers (trend = sum div 7,
    * seasonal = sum div count), so residual = cnt − trend − seasonal
    * reconstructs exactly.
    *
    * Scale shape: census agg, one type-keyed window exchange (trend +
    * row bounds share it), one (type, dow) agg over the census, one
    * join back on (type, dow) — everything after the census moves
    * O(types·days) rows. */
  def seasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow",
        expr("datediff(day, DATE '1970-01-01') % 7").cast("long"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val span = 2 * DecompHalf + 1
    val trended = daily
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("tsum",
        sum(col("cnt")).over(w.rowsBetween(-DecompHalf, DecompHalf)))
      .filter(col("rn") > DecompHalf && col("rn") <= col("n") - DecompHalf)
      .withColumn("trend", expr(s"tsum div $span"))
      .withColumn("detr", col("cnt") - col("trend"))
    val seasonal = trended.groupBy("event_type", "dow")
      .agg(expr("sum(detr) div count(*)").as("seasonal"))
    trended.join(seasonal, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"),
        col("cnt").cast("long").as("n_events"),
        col("trend").cast("long").as("trend"),
        col("seasonal").cast("long").as("seasonal"),
        (col("cnt") - col("trend") - col("seasonal")).cast("long").as("residual"))
      .orderBy("event_type", "day")
  }

  // ---------------------------------------------------------------- q172
  /** q172: volume trend — per event type, the least-squares slope of
    * daily counts against the observed-day index, in milli events per
    * day. The long-horizon companion to q146 (per-day deviations),
    * q165 (abrupt shifts) and q164 (autocorrelation): is this series
    * structurally growing or decaying, and how fast. x = row index
    * (1..n observed days — gaps don't distort spacing), y = count;
    * moments (Σx, Σy, Σxy, Σxx) are exact DECIMAL(38,0) sums and only
    * the final slope ratio is float (the q163/q169 discipline).
    *
    * Scale shape: the (type, day) census hash agg, one type-keyed
    * window for the row index, and a per-type moment rollup on the
    * bounded census. */
  def volumeTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily.withColumn("rn", row_number().over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_days"),
        Det.lsum(col("rn")).as("sx"), Det.lsum(col("cnt")).as("sy"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * cnt")).as("sxy"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * rn")).as("sxx"))
      .select(col("event_type"), col("n_days"),
        expr("CAST(n_days * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)").as("num"),
        expr("CAST(n_days * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)").as("den"))
      .withColumn("slope_milli",
        expr("""CASE WHEN den = 0 THEN NULL
               |ELSE CAST(round(1000.0 * num / den) AS BIGINT) END""".stripMargin))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q181
  /** Rolling active-user window width (days). */
  val WauWindowDays = 7

  /** q181: rolling 7-day active users (WAU) — for every day whose
    * trailing [[WauWindowDays]]-day window saw at least one active
    * user, the EXACT distinct-user count. (A day whose whole trailing
    * window is silent emits NO row rather than wau = 0 — the consumer
    * treats absence as zero; densifying against a calendar grid is
    * q66's resample join if a dashboard needs explicit zeros.)
    * Distinct-over-sliding-window does
    * not decompose into window functions, so the standard exact
    * unfold applies: each (user, active-day) row claims the next 7
    * report days (a bounded explode), and WAU(d) = distinct users
    * claiming d. Report days are restricted to the observed span so
    * the tail beyond the last event doesn't emit phantom rows.
    *
    * Scale shape: the (user, day) distinct is the one data-sized
    * exchange; the unfold multiplies it by the CONSTANT window width
    * and the second distinct+count aggregates on the day key with
    * map-side combine. (At petabyte scale the approximate variant
    * swaps the second distinct for q39's mergeable HLL per day —
    * same frame, sketch column.) */
  def rollingActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
    val span = ud.agg(max("day").as("last_day"))
    val claimed = ud
      .withColumn("report_day",
        explode(expr(s"sequence(day, date_add(day, ${WauWindowDays - 1}))")))
      .crossJoin(broadcast(span))
      .filter(col("report_day") <= col("last_day"))
    claimed
      .groupBy("report_day")
      .agg(countDistinct("user_id").as("wau"))
      .select(col("report_day"), col("wau").cast("long").as("wau"))
      .orderBy("report_day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_rolling_wau" -> (rollingActiveUsers _),
    "q172_volume_trend" -> (volumeTrend _),
    "q165_cusum_shift" -> (cusumShift _),
    "q166_seasonal_decompose" -> (seasonalDecompose _),
    "q164_volume_autocorr" -> (volumeAutocorr _),
    "q146_ewma_anomaly" -> (ewmaAnomaly _),
    "q147_activity_streaks" -> (activityStreaks _),
    "q148_last_touch" -> (lastTouchAttribution _),
    "q149_session_paths" -> (sessionPaths _),
    "q153_rfm_features" -> (rfmFeatures _),
    "q154_position_conversion" -> (positionConversion _),
    "q159_linear_attribution" -> (linearAttribution _)
  )

  val oracles: Map[String, String] = Map(
    "q181_rolling_wau" ->
      s"""WITH ud AS (
         | SELECT DISTINCT user_id,
         |  CAST(date_trunc('day', ts) AS DATE) AS day
         | FROM events),
         |sp AS (SELECT max(day) AS last_day FROM ud),
         |cl AS (
         | SELECT user_id,
         |  CAST(day + CAST(i AS INTEGER) AS DATE) AS report_day
         | FROM ud, UNNEST(range(0, $WauWindowDays)) AS t(i)),
         |f AS (SELECT user_id, report_day FROM cl CROSS JOIN sp
         |      WHERE report_day <= last_day)
         |SELECT report_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
         |FROM f GROUP BY report_day ORDER BY report_day""".stripMargin,
    "q172_volume_trend" ->
      """WITH daily AS (
        | SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  count(*) AS cnt
        | FROM events GROUP BY 1, 2),
        |r AS (
        | SELECT event_type, cnt,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        | FROM daily),
        |m AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(rn) AS BIGINT) AS sx, CAST(sum(cnt) AS BIGINT) AS sy,
        |  sum(CAST(rn AS HUGEINT) * cnt) AS sxy,
        |  sum(CAST(rn AS HUGEINT) * rn) AS sxx
        | FROM r GROUP BY event_type)
        |SELECT event_type, n_days,
        | CAST(n_days * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
        | CAST(n_days * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den,
        | CASE WHEN n_days * sxx - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
        |  ELSE CAST(round(1000.0 * (n_days * sxy - CAST(sx AS HUGEINT) * sy)
        |    / (n_days * sxx - CAST(sx AS HUGEINT) * sx)) AS BIGINT)
        | END AS slope_milli
        |FROM m ORDER BY event_type""".stripMargin,
    "q165_cusum_shift" ->
      s"""WITH daily AS (
         | SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |  count(*) AS cnt
         | FROM events GROUP BY 1, 2),
         |r AS (
         | SELECT event_type, day, cnt,
         |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
         | FROM daily),
         |b AS (
         | SELECT event_type, day, cnt, rn,
         |  sum(CASE WHEN rn <= $CusumBaselineDays THEN cnt END)
         |    OVER (PARTITION BY event_type ORDER BY day
         |          ROWS UNBOUNDED PRECEDING) AS bsum
         | FROM r),
         |f AS (
         | SELECT event_type, day, cnt,
         |  bsum // $CusumBaselineDays AS mu,
         |  (bsum // $CusumBaselineDays) * $CusumSlackPct // 100 AS k,
         |  greatest(bsum // $CusumBaselineDays, 1) * $CusumThresholdX AS h
         | FROM b WHERE rn > $CusumBaselineDays),
         |p AS (
         | SELECT event_type, day, cnt, mu, h,
         |  sum(cnt - mu - k) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS UNBOUNDED PRECEDING) AS p_pos,
         |  sum(mu - cnt - k) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS UNBOUNDED PRECEDING) AS p_neg
         | FROM f),
         |sf AS (
         | SELECT event_type, day, cnt, mu, h,
         |  p_pos - least(0, min(p_pos) OVER (PARTITION BY event_type
         |    ORDER BY day ROWS UNBOUNDED PRECEDING)) AS s_pos,
         |  p_neg - least(0, min(p_neg) OVER (PARTITION BY event_type
         |    ORDER BY day ROWS UNBOUNDED PRECEDING)) AS s_neg
         | FROM p)
         |SELECT event_type, day, CAST(cnt AS BIGINT) AS n_events,
         | CAST(mu AS BIGINT) AS baseline,
         | CAST(s_pos AS BIGINT) AS s_pos, CAST(s_neg AS BIGINT) AS s_neg,
         | CAST(s_pos >= h OR s_neg >= h AS BIGINT) AS is_shift
         |FROM sf ORDER BY event_type, day""".stripMargin,
    "q166_seasonal_decompose" -> {
      val span = 2 * DecompHalf + 1
      s"""WITH daily AS (
         | SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |  count(*) AS cnt,
         |  date_diff('day', DATE '1970-01-01',
         |    CAST(date_trunc('day', ts) AS DATE)) % 7 AS dow
         | FROM events GROUP BY 1, 2, 4),
         |t AS (
         | SELECT event_type, day, cnt, dow,
         |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n,
         |  sum(cnt) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN $DecompHalf PRECEDING AND $DecompHalf FOLLOWING) AS tsum
         | FROM daily),
         |tr AS (
         | SELECT event_type, day, cnt, dow, tsum // $span AS trend,
         |  cnt - tsum // $span AS detr
         | FROM t WHERE rn > $DecompHalf AND rn <= n - $DecompHalf),
         |seas AS (
         | SELECT event_type, dow, sum(detr) // count(*) AS seasonal
         | FROM tr GROUP BY 1, 2)
         |SELECT tr.event_type, tr.day, CAST(cnt AS BIGINT) AS n_events,
         | CAST(trend AS BIGINT) AS trend,
         | CAST(seasonal AS BIGINT) AS seasonal,
         | CAST(cnt - trend - seasonal AS BIGINT) AS residual
         |FROM tr JOIN seas ON tr.event_type = seas.event_type
         |  AND tr.dow = seas.dow
         |ORDER BY tr.event_type, tr.day""".stripMargin
    },
    "q164_volume_autocorr" -> {
      val arms = AcfLags.map { k =>
        s"""SELECT event_type, CAST($k AS BIGINT) AS lag,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(count(*) * sum(CAST(cnt AS HUGEINT) * l$k)
           |    - CAST(sum(cnt) AS HUGEINT) * sum(l$k) AS BIGINT) AS num,
           |  CAST(count(*) * sum(CAST(cnt AS HUGEINT) * cnt)
           |    - CAST(sum(cnt) AS HUGEINT) * sum(cnt) AS BIGINT) AS den_a,
           |  CAST(count(*) * sum(CAST(l$k AS HUGEINT) * l$k)
           |    - CAST(sum(l$k) AS HUGEINT) * sum(l$k) AS BIGINT) AS den_b
           | FROM lagged WHERE l$k IS NOT NULL GROUP BY event_type""".stripMargin
      }.mkString("\n |UNION ALL\n ")
      val lagCols = AcfLags.map(k =>
        s"lag(cnt, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
        .mkString(",\n |  ")
      s"""WITH daily AS (
         | SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |  count(*) AS cnt
         | FROM events GROUP BY 1, 2),
         |lagged AS (
         | SELECT event_type, day, cnt,
         |  $lagCols
         | FROM daily),
         |m AS ($arms)
         |SELECT event_type, lag, n_pairs, num, den_a, den_b,
         | CASE WHEN den_a = 0 OR den_b = 0 THEN NULL
         |  ELSE CAST(round(1000.0 * num /
         |    sqrt(CAST(den_a AS DOUBLE) * CAST(den_b AS DOUBLE))) AS BIGINT)
         | END AS acf_milli
         |FROM m ORDER BY event_type, lag""".stripMargin
    },
    "q146_ewma_anomaly" -> {
      val lags = EwmaWeights.indices.map(i =>
        s"lag(n_events, ${i + 1}) OVER (PARTITION BY event_type ORDER BY day) AS l${i + 1}")
        .mkString(",\n |  ")
      val num = EwmaWeights.zipWithIndex
        .map { case (wgt, i) => s"$wgt * l${i + 1}" }.mkString(" + ")
      s"""WITH daily AS (
         | SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |  count(*) AS n_events
         | FROM events GROUP BY 1, 2),
         |lagged AS (
         | SELECT event_type, day, n_events,
         |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
         |  $lags
         | FROM daily),
         |p AS (
         | SELECT event_type, day, n_events,
         |  ($num) // ${EwmaWeights.sum} AS pred
         | FROM lagged WHERE rn > ${EwmaWeights.size}),
         |d AS (
         | SELECT event_type, day, n_events, pred,
         |  (n_events - pred) * 1000 // greatest(pred, 1) AS dev_milli
         | FROM p)
         |SELECT event_type, day,
         | CAST(n_events AS BIGINT) AS n_events,
         | CAST(pred AS BIGINT) AS pred,
         | CAST(dev_milli AS BIGINT) AS dev_milli,
         | CAST(abs(dev_milli) >= $AnomalyMilli AS BIGINT) AS is_anomaly
         |FROM d ORDER BY event_type, day""".stripMargin
    },
    "q147_activity_streaks" ->
      """WITH days AS (
        | SELECT DISTINCT user_id,
        |  date_diff('day', DATE '1970-01-01',
        |    CAST(date_trunc('day', ts) AS DATE)) AS dn
        | FROM events),
        |isl AS (
        | SELECT user_id,
        |  dn - row_number() OVER (PARTITION BY user_id ORDER BY dn) AS isl
        | FROM days),
        |runs AS (
        | SELECT user_id, isl, count(*) AS len FROM isl GROUP BY 1, 2)
        |SELECT user_id,
        | CAST(sum(len) AS BIGINT) AS n_active_days,
        | CAST(count(*) AS BIGINT) AS n_streaks,
        | CAST(max(len) AS BIGINT) AS longest_streak
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q148_last_touch" ->
      s"""WITH e AS (
         | SELECT user_id, event_id, event_type, epoch_us(ts) AS us, value
         | FROM events),
         |t AS (
         | SELECT user_id, event_type, us, value,
         |  last_value(CASE WHEN event_type != 'purchase' THEN event_type END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY us, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_type,
         |  last_value(CASE WHEN event_type != 'purchase' THEN us END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY us, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_us
         | FROM e),
         |p AS (
         | SELECT CASE WHEN attr_us IS NOT NULL
         |     AND us - attr_us <= $AttributionHorizonMicros
         |   THEN attr_type ELSE 'direct' END AS channel, value
         | FROM t WHERE event_type = 'purchase')
         |SELECT channel,
         | CAST(count(*) AS BIGINT) AS n_purchases,
         | CAST(sum(round(value * 100)) AS BIGINT) AS revenue_cents
         |FROM p GROUP BY channel ORDER BY channel""".stripMargin,
    "q149_session_paths" ->
      s"""WITH e AS (
         | SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         |f AS (
         | SELECT user_id, event_id, event_type, us,
         |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
         |    OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |       > $AttributionHorizonMicros THEN 1 ELSE 0 END AS new_sess
         | FROM e),
         |sess AS (
         | SELECT user_id, event_id, event_type, us,
         |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sess_id
         | FROM f),
         |rn AS (
         | SELECT user_id, sess_id, event_type, us,
         |  row_number() OVER (PARTITION BY user_id, sess_id
         |    ORDER BY us, event_id) AS rn
         | FROM sess),
         |paths AS (
         | SELECT user_id, sess_id,
         |  string_agg(event_type, '>' ORDER BY rn) AS path
         | FROM rn WHERE rn <= $PathSteps GROUP BY 1, 2),
         |census AS (
         | SELECT path, count(*) AS n_sessions FROM paths GROUP BY path),
         |top AS (
         | SELECT path, n_sessions,
         |  row_number() OVER (ORDER BY n_sessions DESC, path) AS rank
         | FROM census)
         |SELECT CAST(rank AS BIGINT) AS rank, path,
         | CAST(n_sessions AS BIGINT) AS n_sessions
         |FROM top WHERE rank <= $PathTopK ORDER BY rank""".stripMargin,
    "q153_rfm_features" ->
      """WITH e AS (
        | SELECT user_id, event_type,
        |  CAST(date_trunc('day', ts) AS DATE) AS day, value
        | FROM events),
        |m AS (SELECT max(day) AS corpus_last_day FROM e),
        |b AS (
        | SELECT user_id, max(day) AS last_day,
        |  count(*) AS n_events,
        |  count(DISTINCT day) AS n_active_days,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |    THEN round(value * 100) ELSE 0 END) AS BIGINT) AS revenue_cents
        | FROM e GROUP BY 1),
        |t AS (
        | SELECT user_id, event_type AS top_type FROM (
        |  SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY count(*) DESC, event_type) AS trn
        |  FROM e GROUP BY user_id, event_type) x
        | WHERE trn = 1)
        |SELECT b.user_id,
        | CAST(date_diff('day', last_day, corpus_last_day) AS BIGINT) AS recency_days,
        | CAST(n_events AS BIGINT) AS n_events,
        | CAST(n_active_days AS BIGINT) AS n_active_days,
        | revenue_cents, top_type
        |FROM b JOIN t USING (user_id) CROSS JOIN m
        |ORDER BY b.user_id""".stripMargin,
    "q154_position_conversion" ->
      s"""WITH e AS (
         | SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         |f AS (
         | SELECT user_id, event_id, event_type, us,
         |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
         |    OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |       > $AttributionHorizonMicros THEN 1 ELSE 0 END AS new_sess
         | FROM e),
         |sess AS (
         | SELECT user_id, event_id, event_type, us,
         |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sess_id
         | FROM f),
         |rn AS (
         | SELECT event_type,
         |  row_number() OVER (PARTITION BY user_id, sess_id
         |    ORDER BY us, event_id) AS rn
         | FROM sess),
         |p AS (
         | SELECT least(rn, $PosCap) AS position, event_type FROM rn)
         |SELECT CAST(position AS BIGINT) AS position,
         | CAST(count(*) AS BIGINT) AS n_events,
         | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         | ${OracleSql.ppmSql("sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)", "count(*)")} AS purchase_ppm
         |FROM p GROUP BY position ORDER BY position""".stripMargin,
    "q159_linear_attribution" ->
      s"""WITH e AS (
         | SELECT user_id, event_id, event_type, epoch_us(ts) AS us, value
         | FROM events),
         |p AS (
         | SELECT user_id, event_id AS p_id, us AS p_us,
         |  CAST(round(value * 100) AS BIGINT) AS cents
         | FROM e WHERE event_type = 'purchase'),
         |t AS (
         | SELECT user_id, event_id AS t_id, event_type AS channel, us AS t_us
         | FROM e WHERE event_type != 'purchase'),
         |j AS (
         | SELECT p.p_id, p.cents, t.channel, t.t_us, t.t_id
         | FROM p JOIN t USING (user_id)
         | WHERE (t.t_us < p.p_us OR (t.t_us = p.p_us AND t.t_id < p.p_id))
         |   AND p.p_us - t.t_us <= $AttributionHorizonMicros),
         |r AS (
         | SELECT channel, cents,
         |  count(*) OVER (PARTITION BY p_id) AS n_touch,
         |  row_number() OVER (PARTITION BY p_id
         |    ORDER BY t_us DESC, t_id DESC) AS trn
         | FROM j),
         |cr AS (
         | SELECT channel, count(*) AS n_credits,
         |  sum(cents // n_touch
         |    + CASE WHEN trn = 1 THEN cents % n_touch ELSE 0 END) AS attributed_cents
         | FROM r GROUP BY channel),
         |dr AS (
         | SELECT 'direct' AS channel, count(*) AS n_credits,
         |  coalesce(sum(cents), 0) AS attributed_cents
         | FROM p WHERE p_id NOT IN (SELECT DISTINCT p_id FROM j))
         |SELECT channel, CAST(n_credits AS BIGINT) AS n_credits,
         | CAST(attributed_cents AS BIGINT) AS attributed_cents
         |FROM (SELECT * FROM cr UNION ALL SELECT * FROM dr) u
         |ORDER BY channel""".stripMargin
  )
}
