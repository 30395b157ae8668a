package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral-analytics operators over the `events` table: ordered
  * funnel progression (q60) and cohort retention (q61) — the two
  * warehouse workloads every product-analytics stack runs beside plain
  * aggregation and sessionization (q18/q20).
  *
  * Scale shape: both are chains of hash aggregations and equi-joins on
  * `user_id` — every stage shuffles on the SAME key, so Spark reuses
  * one partitioning end-to-end (and co-partitioned bucketing would
  * remove the exchanges entirely, see ScaleJoins). Timestamps surface
  * as epoch micros (`unix_micros` / DuckDB `epoch_us`), the engines'
  * one bit-identical meeting point for nanos-born event times. */
object Funnels {

  /** Funnel step order: each step counts only events strictly AFTER
    * the user's previous step time — progression, not co-occurrence. */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Ordered funnel (q60): per user, the first time each step was
    * reached given the previous step had been reached before it;
    * NULL once the chain breaks. One filtered min-agg per step joined
    * against the previous frontier — each stage is a hash agg + hash
    * join on user_id, never a per-user event sort. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val first = e.filter(col("event_type") === FunnelSteps.head)
      .groupBy("user_id").agg(min("us").as("t1"))
    val steps = FunnelSteps.zipWithIndex.drop(1)
      .foldLeft(List(first)) { case (acc, (typ, i)) =>
        val prevCol = s"t$i"
        val frontier = acc.head.select(col("user_id"), col(prevCol))
        val next = e.filter(col("event_type") === typ)
          .join(frontier, "user_id")
          .filter(col("us") > col(prevCol))
          .groupBy("user_id").agg(min("us").as(s"t${i + 1}"))
        next :: acc
      }.reverse
    // each step frame is exactly (user_id, tN); assemble left-to-right
    steps.tail.foldLeft(steps.head) { (out, st) =>
      out.join(st, Seq("user_id"), "left")
    }.orderBy("user_id")
  }

  /** Cohort retention (q61): users bucketed by the week they were
    * first seen; for every (cohort week, weeks-since) cell, how many
    * distinct cohort members were active. First-seen is one min-agg;
    * activity is a distinct projection; the cell counts are one
    * distinct-agg — three shuffles, all on user/cohort keys. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val cohort = e.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val active = e.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("week")).distinct()
    active.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_week"),
        // week-truncated dates differ by exact multiples of 7 days
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Event-type transition matrix (q107): for every ordered pair of
    * event types, how often the second immediately follows the first
    * in a user's timeline, with an integer-ppm row-normalized
    * probability — the first-order Markov model behind journey
    * analysis, anomaly scoring ("this transition never happens") and
    * synthetic-session generation. Ordering is (event time, event_id):
    * the same total order the sessionizer (q20) uses, with the id
    * tie-break making the lead() deterministic when two events share a
    * microsecond.
    *
    * Scale shape: ONE window exchange on user_id (the per-user
    * timeline partition every behavioral op here already shuffles on),
    * then a hash aggregation whose key space is |event types|² — the
    * output and the row-normalizing window are constant-sized
    * regardless of corpus scale, so the user_id exchange is the whole
    * cost at 100 TB. */
  def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    trans.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div n_from").as("ppm"))
      .orderBy("from_type", "to_type")
  }

  // ---------------------------------------------------------------- q120
  private[ops] val TopTriples = 20

  /** Frequent length-3 event sequences (q120): the trigram extension
    * of q107's transition matrix — which three-step journeys dominate,
    * the input to funnel DISCOVERY (q60 checks a declared funnel;
    * this surfaces candidates). Same per-user total order (event
    * time, event_id), two lead() taps over the one user_id window,
    * global census, deterministic top-k with (types) tie-break.
    *
    * Scale shape: the single user_id window exchange is the whole
    * data-sized cost (both leads share it); the census key space is
    * |event types|³ — constant — and the top-k is a TakeOrdered, no
    * extra shuffle. */
  def eventTriples(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val tri = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .select(col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
    tri.groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("e1").asc, col("e2").asc, col("e3").asc)
      .limit(TopTriples)
  }

  // ---------------------------------------------------------------- q123
  /** Day-of-week seasonality profile (q123): per (event type, weekday)
    * — count, mean value in milli-cents, and a seasonal index in
    * milli (weekday mean ÷ the type's overall mean) — the baseline a
    * metrics monitor divides out before alerting, so Monday's dip
    * isn't an incident. Weekday is pinned cross-engine as Sunday=0
    * (Spark's `dayofweek` is 1-based Sunday=1, DuckDB's 0-based; the
    * −1 shift makes them agree). The index divides two already-exact
    * integers (never a product of sums that could overflow at
    * volume), truncating div over non-negative operands.
    *
    * Scale shape: one groupBy on the constant-sized (type, dow) key
    * with map-side partials; the per-type totals derive from the
    * 35-row result itself — no second scan, no window. */
  def dowSeasonality(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables.events(s, dir)
      .select(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"),
        Det.cents(col("value")).cast("long").as("cents"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
    val typ = Window.partitionBy("event_type")
    cell
      .withColumn("n_type", sum("n").over(typ))
      .withColumn("sum_type", sum("sum_cents").over(typ))
      .select(col("event_type"), col("dow").cast("long").as("dow"),
        col("n"), expr("sum_cents * 1000 div n").as("mean_milli"),
        expr("(sum_cents * 1000 div n) * 1000 div (sum_type * 1000 div n_type)")
          .as("index_milli"))
      .orderBy("event_type", "dow")
  }

  // ---------------------------------------------------------------- q127
  /** Inter-event gap histogram (q127): per event type, the log₂
    * distribution of the time since the user's previous event (any
    * type; the gap is attributed to the LATER event). The bucket is
    * the BIT LENGTH of the gap in milliseconds — an integer stand-in
    * for ⌊log₂⌋+1 that both engines compute from the binary rendering
    * (Spark `bin`, DuckDB `format('{:b}')`), keeping the log-free
    * discipline — plus a per-type ppm share. The latency-shape
    * diagnostic behind session-timeout tuning (q20 hardcodes a gap
    * threshold; this shows where the bimodal valley actually is).
    *
    * Scale shape: the one user_id window exchange every timeline op
    * here pays, then a (type × ~40 buckets) census with map-side
    * partials — constant output, window on the tiny census. */
  def gapHistogram(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("event_type"),
        length(bin(expr("(us - prev_us) div 1000"))).cast("long").as("bucket"))
    gaps.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_type", sum("n").over(Window.partitionBy("event_type")))
      .select(col("event_type"), col("bucket"), col("n"),
        expr("n * 1000000 div n_type").as("ppm"))
      .orderBy("event_type", "bucket")
  }

  // ---------------------------------------------------------------- q135
  /** q135: growth accounting — per day: active users, first-ever-seen
    * (new) vs returning, and the cumulative user base; the
    * new/returning split every growth dashboard leads with. First-seen
    * is one min-agg on user_id; activity is a distinct projection; the
    * cumulative sum runs over the bounded day grid.
    *
    * Scale shape: two user_id-keyed passes (first-seen agg, distinct
    * activity) that share a partitioning + a join on the same key,
    * then a day census — constant-sized — carrying the running total. */
  def growthAccounting(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
    val firstSeen = e.groupBy("user_id").agg(min("day").as("first_day"))
    val active = e.distinct()
    val daily = active.join(firstSeen, "user_id")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum((col("day") === col("first_day")).cast("long")).as("n_new"))
    daily
      .withColumn("cum_users", sum("n_new").over(
        Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("n_active"),
        col("n_new").cast("long").as("n_new"),
        (col("n_active") - col("n_new")).cast("long").as("n_returning"),
        col("cum_users").cast("long").as("cum_users"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q137
  /** q137: week-over-week change — per (event type, week): the count
    * and its signed delta vs the previous week in ppm, the trend line
    * behind every "up/down X% WoW" alert. The delta divides two exact
    * counts with truncating div; both engines truncate toward zero for
    * NEGATIVE deltas too (verified: Spark `div` ≡ DuckDB `//`). First
    * week per type has no baseline → NULL delta.
    *
    * Scale shape: one (type, week) census with map-side partials; the
    * lag window runs over the bounded census. */
  def wowChange(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(s, dir)
      .select(col("event_type"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .groupBy("event_type", "week")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("week")
    weekly.withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("event_type"), col("week"), col("n"), col("prev_n"),
        expr("(n - prev_n) * 1000000 div prev_n").as("delta_ppm"))
      .orderBy("event_type", "week")
  }

  // ---------------------------------------------------------------- q138
  /** q138: conversion-latency histogram — among users who completed
    * the whole q60 funnel, the log₂ distribution of signup→purchase
    * seconds (q127's bit-length bucket over the funnel's output).
    * Funnel completion times are q60's exactly; the histogram is a
    * constant-sized census of the K-user funnel frame.
    *
    * Scale shape: q60's agg/join chain (all user_id-keyed) + one
    * census over its output — no new data-sized exchange. */
  def conversionLatency(s: SparkSession, dir: String): DataFrame = {
    val lastT = s"t${FunnelSteps.size}"
    funnel(s, dir)
      .filter(col(lastT).isNotNull)
      .select(length(bin(expr(s"($lastT - t1) div 1000000"))).cast("long")
        .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"))
      .withColumn("ppm", expr(
        "n_users * 1000000 div sum(n_users) over ()"))
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------- q174
  /** q174: k-step Markov reachability — q107's transition matrix
    * raised to the 2nd and 3rd power by relational matrix
    * multiplication: P²(a,c) = Σ_b P(a,b)·P(b,c) div 1e6, then
    * P³ = P²·P. Answers "from a `view`, how likely is a `purchase`
    * within exactly 2 or 3 steps" — the journey-planning number the
    * one-step matrix can't give. Truncating integer ppm composition
    * is deterministic in both engines; the div-after-sum keeps each
    * entry exact to 1 ppm of the true product.
    *
    * Scale shape: the data-sized work is q107's — one user-timeline
    * window + the |types|² census. Each matrix power is a self-join +
    * hash agg on the K²-row census (K = |event types|), constant cost
    * at any corpus size — linear algebra as relational ops on a
    * bounded frame, the q59/q125 centroid-frame argument. */
  def markovPower(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val p1 = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"),
        expr("n * 1000000 div n_from").as("p"))
    def mult(x: DataFrame, y: DataFrame): DataFrame =
      x.select(col("from_type"), col("to_type").as("mid"), col("p").as("px"))
        .join(y.select(col("from_type").as("mid"), col("to_type"),
          col("p").as("py")), "mid")
        .groupBy("from_type", "to_type")
        .agg(expr("sum(px * py) div 1000000").as("p"))
    val p2 = mult(p1, p1)
    val p3 = mult(p2, p1)
    p1.select(col("from_type"), col("to_type"), col("p").as("ppm1"))
      .join(p2.select(col("from_type"), col("to_type"), col("p").as("ppm2")),
        Seq("from_type", "to_type"), "full_outer")
      .join(p3.select(col("from_type"), col("to_type"), col("p").as("ppm3")),
        Seq("from_type", "to_type"), "full_outer")
      .select(col("from_type"), col("to_type"),
        coalesce(col("ppm1"), lit(0L)).cast("long").as("ppm1"),
        coalesce(col("ppm2"), lit(0L)).cast("long").as("ppm2"),
        coalesce(col("ppm3"), lit(0L)).cast("long").as("ppm3"))
      .orderBy("from_type", "to_type")
  }

  // ---------------------------------------------------------------- q184
  /** q184: weekly churn accounting — q135's quad completed: per epoch
    * week, actives split into new (first-ever week), retained (also
    * active the prior week) and resurrected (returning after a gap),
    * plus the users CHURNED into this week (active the prior week,
    * silent now). The conservation identities are arithmetic:
    * n_active = n_new + n_retained + n_resurrected, and
    * n_churned(w) = n_active(w−1) − n_retained(w) — auditable at any
    * scale by one rollup. Weeks are epoch-day div 7 (engine-neutral,
    * the q166 dow trick at week grain).
    *
    * Scale shape: ONE (user, week) distinct is the only data-sized
    * exchange; statuses come from lag/lead windows sharing the user
    * partitioning; both censuses and their splice are O(weeks).
    * Churn attributes to week v+1 from each activity row whose next
    * active week isn't v+1 — emitted only inside the observed span. */
  def churnAccounting(s: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(s, dir)
      .select(col("user_id"),
        expr("datediff(CAST(date_trunc('day', ts) AS DATE), DATE '1970-01-01') div 7")
          .as("wk"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("wk")
    val flagged = uw
      .withColumn("prev_wk", lag(col("wk"), 1).over(w))
      .withColumn("next_wk", lead(col("wk"), 1).over(w))
    val status = flagged.select(col("wk"),
      when(col("prev_wk").isNull, lit("new"))
        .when(col("prev_wk") === col("wk") - 1, lit("retained"))
        .otherwise(lit("resurrected")).as("st"))
      .groupBy("wk")
      .agg(count(lit(1)).as("n_active"),
        sum((col("st") === "new").cast("long")).as("n_new"),
        sum((col("st") === "retained").cast("long")).as("n_retained"),
        sum((col("st") === "resurrected").cast("long")).as("n_resurrected"))
    val span = uw.agg(max("wk").as("max_wk"))
    val churn = flagged
      .filter(col("next_wk").isNull || col("next_wk") > col("wk") + 1)
      .select((col("wk") + 1).as("wk"))
      .crossJoin(broadcast(span))
      .filter(col("wk") <= col("max_wk"))
      .groupBy("wk").agg(count(lit(1)).as("n_churned"))
    // full outer: a week can have churn but ZERO actives (everyone
    // left at once) — a left join would silently drop that row
    status.join(churn, Seq("wk"), "full_outer")
      .select(col("wk").cast("long").as("wk"),
        coalesce(col("n_active"), lit(0L)).cast("long").as("n_active"),
        coalesce(col("n_new"), lit(0L)).cast("long").as("n_new"),
        coalesce(col("n_retained"), lit(0L)).cast("long").as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).cast("long").as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).cast("long").as("n_churned"))
      .orderBy("wk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q184_churn_accounting" -> (churnAccounting _),
    "q174_markov_power" -> (markovPower _),
    "q60_funnel" -> (funnel _),
    "q61_cohort_retention" -> (cohortRetention _),
    "q107_markov_transitions" -> (markovTransitions _),
    "q120_event_triples" -> (eventTriples _),
    "q123_dow_seasonality" -> (dowSeasonality _),
    "q127_gap_histogram" -> (gapHistogram _),
    "q135_growth_accounting" -> (growthAccounting _),
    "q137_wow_change" -> (wowChange _),
    "q138_conversion_latency" -> (conversionLatency _)
  )

  val oracles: Map[String, String] = Map(
    "q184_churn_accounting" ->
      """WITH uw AS (
        | SELECT DISTINCT user_id,
        |  date_diff('day', DATE '1970-01-01',
        |    CAST(date_trunc('day', ts) AS DATE)) // 7 AS wk
        | FROM events),
        |f AS (
        | SELECT user_id, wk,
        |  lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
        |  lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
        | FROM uw),
        |st AS (
        | SELECT wk, count(*) AS n_active,
        |  sum(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END) AS n_new,
        |  sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END) AS n_retained,
        |  sum(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
        |      THEN 1 ELSE 0 END) AS n_resurrected
        | FROM f GROUP BY wk),
        |sp AS (SELECT max(wk) AS max_wk FROM uw),
        |ch AS (
        | SELECT wk + 1 AS wk, count(*) AS n_churned
        | FROM f CROSS JOIN sp
        | WHERE (next_wk IS NULL OR next_wk > wk + 1) AND wk + 1 <= max_wk
        | GROUP BY wk + 1)
        |SELECT CAST(wk AS BIGINT) AS wk,
        | CAST(coalesce(n_active, 0) AS BIGINT) AS n_active,
        | CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
        | CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
        | CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
        | CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
        |FROM st FULL OUTER JOIN ch USING (wk)
        |ORDER BY wk""".stripMargin,
    "q174_markov_power" ->
      s"""WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |tr AS (
        | SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS to_type
        | FROM e),
        |c AS (
        | SELECT from_type, to_type, count(*) AS n FROM tr
        | WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |p1 AS (
        | SELECT from_type, to_type,
        |  ${OracleSql.ppmSql("n", "sum(n) OVER (PARTITION BY from_type)")} AS p
        | FROM c),
        |p2 AS (
        | SELECT x.from_type, y.to_type,
        |  CAST(sum(x.p * y.p) // 1000000 AS BIGINT) AS p
        | FROM p1 x JOIN p1 y ON y.from_type = x.to_type GROUP BY 1, 2),
        |p3 AS (
        | SELECT x.from_type, y.to_type,
        |  CAST(sum(x.p * y.p) // 1000000 AS BIGINT) AS p
        | FROM p2 x JOIN p1 y ON y.from_type = x.to_type GROUP BY 1, 2)
        |SELECT from_type, to_type,
        | CAST(coalesce(p1.p, 0) AS BIGINT) AS ppm1,
        | CAST(coalesce(p2.p, 0) AS BIGINT) AS ppm2,
        | CAST(coalesce(p3.p, 0) AS BIGINT) AS ppm3
        |FROM p1
        | FULL OUTER JOIN p2 USING (from_type, to_type)
        | FULL OUTER JOIN p3 USING (from_type, to_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "q60_funnel" -> {
      val stepCtes = FunnelSteps.zipWithIndex.drop(1).map { case (typ, i) =>
        s"""s${i + 1} AS (SELECT e.user_id, min(us) AS t${i + 1}
           |  FROM e JOIN s$i USING (user_id)
           |  WHERE event_type = '$typ' AND us > t$i GROUP BY e.user_id)""".stripMargin
      }.mkString(",\n")
      val joins = (2 to FunnelSteps.size)
        .map(i => s"LEFT JOIN s$i USING (user_id)").mkString(" ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |s1 AS (SELECT user_id, min(us) AS t1 FROM e
         |  WHERE event_type = '${FunnelSteps.head}' GROUP BY user_id),
         |$stepCtes
         |SELECT user_id, ${FunnelSteps.indices.map(i => s"t${i + 1}").mkString(", ")}
         |FROM s1 $joins ORDER BY user_id""".stripMargin
    },
    "q107_markov_transitions" ->
      s"""WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |p AS (
        | SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS to_type
        | FROM e),
        |c AS (
        | SELECT from_type, to_type, count(*) AS n FROM p
        | WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        | ${OracleSql.ppmSql("n", "sum(n) OVER (PARTITION BY from_type)")} AS ppm
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q61_cohort_retention" ->
      """WITH cohort AS (
        | SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        | FROM events GROUP BY user_id),
        |active AS (
        | SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        | FROM events)
        |SELECT cohort_week,
        | CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
        | count(DISTINCT user_id) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q120_event_triples" ->
      s"""WITH e AS (
         | SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         | FROM events),
         |p AS (
         | SELECT event_type AS e1,
         |  lead(event_type, 1) OVER w AS e2,
         |  lead(event_type, 2) OVER w AS e3
         | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
         |SELECT e1, e2, e3, count(*) AS cnt
         |FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL
         |GROUP BY 1, 2, 3
         |ORDER BY cnt DESC, e1, e2, e3
         |LIMIT $TopTriples""".stripMargin,
    "q123_dow_seasonality" ->
      """WITH c AS (
        | SELECT event_type, dayofweek(ts) AS dow,
        |  count(*) AS n,
        |  CAST(sum(round(value * 100)) AS BIGINT) AS sum_cents
        | FROM events GROUP BY 1, 2),
        |t AS (
        | SELECT event_type, sum(n) AS n_type, sum(sum_cents) AS sum_type
        | FROM c GROUP BY 1)
        |SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, c.n,
        | CAST(c.sum_cents * 1000 // c.n AS BIGINT) AS mean_milli,
        | CAST((c.sum_cents * 1000 // c.n) * 1000
        |   // (t.sum_type * 1000 // t.n_type) AS BIGINT) AS index_milli
        |FROM c JOIN t USING (event_type)
        |ORDER BY c.event_type, c.dow""".stripMargin,
    "q127_gap_histogram" ->
      s"""WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        | FROM events),
        |g AS (
        | SELECT event_type,
        |  CAST(length(format('{:b}',
        |    (us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id))
        |      // 1000)) AS BIGINT) AS bucket
        | FROM e),
        |c AS (SELECT event_type, bucket, count(*) AS n FROM g
        | WHERE bucket IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, bucket, n,
        | ${OracleSql.ppmSql("n", "sum(n) OVER (PARTITION BY event_type)")} AS ppm
        |FROM c ORDER BY event_type, bucket""".stripMargin,
    "q135_growth_accounting" ->
      """WITH e AS (
        | SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        | FROM events),
        |fs AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1),
        |d AS (
        | SELECT day, count(*) AS n_active,
        |  CAST(sum(CAST(e.day = fs.first_day AS BIGINT)) AS BIGINT) AS n_new
        | FROM e JOIN fs USING (user_id) GROUP BY day)
        |SELECT day, n_active, n_new,
        | CAST(n_active - n_new AS BIGINT) AS n_returning,
        | CAST(sum(n_new) OVER (ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS cum_users
        |FROM d ORDER BY day""".stripMargin,
    "q137_wow_change" ->
      s"""WITH w AS (
        | SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |l AS (
        | SELECT event_type, week, n,
        |  lag(n, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        | FROM w)
        |SELECT event_type, week, n, prev_n,
        | ${OracleSql.ppmSql("(n - prev_n)", "prev_n")} AS delta_ppm
        |FROM l ORDER BY event_type, week""".stripMargin,
    "q138_conversion_latency" -> {
      val stepCtes = FunnelSteps.zipWithIndex.drop(1).map { case (typ, i) =>
        s"""s${i + 1} AS (SELECT e.user_id, min(us) AS t${i + 1}
           |  FROM e JOIN s$i USING (user_id)
           |  WHERE event_type = '$typ' AND us > t$i GROUP BY e.user_id)""".stripMargin
      }.mkString(",\n")
      val lastT = s"t${FunnelSteps.size}"
      val lastS = s"s${FunnelSteps.size}"
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |s1 AS (SELECT user_id, min(us) AS t1 FROM e
         |  WHERE event_type = '${FunnelSteps.head}' GROUP BY user_id),
         |$stepCtes,
         |h AS (
         | SELECT CAST(length(format('{:b}', ($lastT - t1) // 1000000)) AS BIGINT)
         |   AS bucket
         | FROM s1 JOIN $lastS USING (user_id)),
         |c AS (SELECT bucket, count(*) AS n_users FROM h GROUP BY bucket)
         |SELECT bucket, n_users,
         | ${OracleSql.ppmSql("n_users", "(SELECT sum(n_users) FROM c)")} AS ppm
         |FROM c ORDER BY bucket""".stripMargin
    }
  )
}
