package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Binned range join — the scale rewrite of an interval theta-join.
  *
  * q41: per-user purchase attribution — for every 'view' event, count
  * the same user's 'purchase' events inside (view_ts, view_ts + 30 min].
  * Naively that is a non-equi join, which Spark can only execute as a
  * (broadcast) nested loop — O(N·M) per user and a scale killer. The
  * rewrite: quantize time into bins EXACTLY as wide as the attribution
  * window, so any window overlaps at most 2 bins; the view side fans
  * out to those ≤2 bins, the purchase side keeps its 1 bin, and the
  * join becomes a plain hash-shuffle equi-join on (user_id, bin) with
  * the exact interval refined afterwards. Work drops to
  * O(pairs sharing a bin) — the same candidates-then-verify shape as
  * the LSH dedup family, and the standard trick every interval/range
  * join at 100 TB uses.
  *
  * The DuckDB oracle states the SAME semantics as the direct range
  * join (no binning) — proving the rewrite is lossless, not just
  * self-consistent.
  */
object RangeJoin {

  /** Attribution window, and therefore the bin width, in minutes. */
  val WindowMinutes = 30
  private val WindowUs = WindowMinutes * 60L * 1000000L

  def attribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"))
      // a (ts, ts+w] window overlaps bins floor(ts/w) and floor(ts/w)+1
      .withColumn("bin", explode(array(
        coalesce(floor(unix_micros(col("vts")) / WindowUs), lit(-1L)),
        coalesce(floor(unix_micros(col("vts")) / WindowUs) + 1, lit(-1L)))))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pts"))
      .withColumn("bin",
        coalesce(floor(unix_micros(col("pts")) / WindowUs), lit(-2L)))
    views
      .join(purchases, Seq("user_id", "bin"))
      .where(col("pts") > col("vts") &&
        col("pts") <= col("vts") + expr(s"INTERVAL $WindowMinutes MINUTES"))
      .groupBy(col("view_id"), col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        min(col("purchase_id")).as("first_purchase_id"))
      .orderBy("view_id")
  }

  /** q43: the NATURAL spelling of an interval theta-join — per-view
    * platform-wide purchase counts inside (view_ts, view_ts + 30 min],
    * written with no manual binning and no equi key at all. As written
    * Spark can only nested-loop this (O(views × purchases));
    * `graft.plans.BinnedRangeJoinRule` — installed in the Verify/Bench
    * sessions via `spark.sql.extensions=graft.plans.GraftExtensions` —
    * rewrites it to the binned hash join automatically, so this query
    * proves the optimizer rule itself against the DuckDB oracle (the
    * oracle states the direct unbinned theta-join). The rule also
    * SELF-INSTALLS into the session here (idempotent, the same
    * pattern as `AsOf.join`'s strategy), so a plain session gets the
    * binned hash join too instead of silently degrading to the
    * nested loop — `PlanInvariantsSpec` pins that no session plans
    * this query as a BNLJ. */
  def attributionNatural(s: SparkSession, dir: String): DataFrame = {
    // synchronized: the check-then-append on the shared session var
    // races under concurrent query building (double-install is merely
    // redundant — the rule is idempotent — but a lost concurrent
    // append of a DIFFERENT rule would not be)
    RangeJoin.synchronized {
      if (!s.experimental.extraOptimizations.contains(graft.plans.BinnedRangeJoinRule))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.plans.BinnedRangeJoinRule
    }
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("vts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
    views
      .join(purchases, col("pts") > col("vts") &&
        col("pts") <= col("vts") + expr(s"INTERVAL $WindowMinutes MINUTES"))
      .groupBy(col("view_id"))
      .agg(count(lit(1)).as("n_purchases"),
        min(col("purchase_id")).as("first_purchase_id"))
      .orderBy("view_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_range_join_attribution" -> (attribution _),
    "q43_range_join_natural" -> (attributionNatural _)
  )

  val oracles: Map[String, String] = Map(
    "q41_range_join_attribution" ->
      s"""SELECT v.event_id AS view_id, v.user_id AS user_id,
         |  count(*) AS n_purchases,
         |  min(p.event_id) AS first_purchase_id
         |FROM events v JOIN events p
         |  ON p.user_id = v.user_id
         |  AND v.event_type = 'view' AND p.event_type = 'purchase'
         |  AND epoch_us(p.ts) > epoch_us(v.ts)
         |  AND epoch_us(p.ts) <= epoch_us(v.ts) + ${WindowMinutes}*60000000
         |GROUP BY v.event_id, v.user_id
         |ORDER BY view_id""".stripMargin,
    "q43_range_join_natural" ->
      s"""SELECT v.event_id AS view_id,
         |  count(*) AS n_purchases,
         |  min(p.event_id) AS first_purchase_id
         |FROM events v JOIN events p
         |  ON v.event_type = 'view' AND p.event_type = 'purchase'
         |  AND epoch_us(p.ts) > epoch_us(v.ts)
         |  AND epoch_us(p.ts) <= epoch_us(v.ts) + ${WindowMinutes}*60000000
         |GROUP BY v.event_id
         |ORDER BY view_id""".stripMargin
  )
}
