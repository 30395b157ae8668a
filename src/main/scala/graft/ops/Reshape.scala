package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Wide↔long reshape operators — the mart-layer surface the reference's
  * architecture diagram (stages 4–6) declares for its reporting layer
  * but never implements (SURVEY.md §2.8: warehouse/aggregate/data-mart).
  * Pivoted event matrices and long-format measure tables are the two
  * standard shapes a BI mart exports.
  *
  * Scale design notes (all three reshape ops are cheap at 100 TB):
  *
  *   - q79 `unpivot` lowers to a single Expand node — a narrow,
  *     shuffle-free row multiplication ×k measures AFTER the aggregate
  *     has already collapsed the data to O(groups) rows. The expensive
  *     part (the groupBy) shuffles once, map-side combined.
  *   - q80 `pivot(col, values)` is called WITH an explicit value list:
  *     Spark's values-less overload runs an eager `collect()` of the
  *     distinct keys on the driver — an extra job and a scale hazard on
  *     a high-cardinality pivot column. With pinned values Spark plans
  *     a two-phase aggregate — groupBy(day, type) partials, then a
  *     pivot-first groupBy(day) — which is the skew-friendly shape:
  *     a hot day pre-aggregates per (day, type) before the second
  *     exchange. Output schema is statically known (a mart wants that).
  *   - q81 GROUPING SETS evaluates 3 groupings in ONE scan via Expand
  *     (×3 row multiplication before the shuffle) rather than 3 scans +
  *     union — at 100 TB the scan dominates, so sharing it wins 3×.
  */
object Reshape {

  // ---------------------------------------------------------------- q79
  /** Long-format measure export: aggregate wide per (returnflag,
    * linestatus), then melt the 3 measure columns into (measure, value)
    * rows. Mirrors `Dataset.unpivot` — Spark's native melt. */
  def q79Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        lsum(col("l_quantity")).as("sum_qty"),
        lsum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n_rows"))
    wide.unpivot(
        ids = Array(col("l_returnflag"), col("l_linestatus")),
        values = Array(col("sum_qty"), col("sum_price_cents"), col("n_rows")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy("l_returnflag", "l_linestatus", "measure")
  }

  // ---------------------------------------------------------------- q80
  /** Daily event-type matrix: one row per day, one count column per
    * event type. Explicit pivot values ⇒ no driver-side distinct
    * collect, one shuffle, static schema. */
  private val EventTypes = Seq("click", "view", "signup", "purchase", "error")

  def q80Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(to_date(col("ts")).cast("string").as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      // pivot leaves absent (day, type) cells null; a mart exports 0
      .select(col("day") +: EventTypes.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("day")

  // ---------------------------------------------------------------- q81
  /** GROUPING SETS rollout: (flag,status), (flag), (status), () in one
    * scan. `grouping_id()` disambiguates the aggregation level — the
    * standard way a mart distinguishes "status=F subtotal" from a
    * detail row whose key happens to be null. */
  def q81GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), cents(col("l_extendedprice")).as("price_cents"))
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        lsum(col("l_quantity")).as("sum_qty"),
        lsum(col("price_cents")).as("sum_price_cents"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("gid"), col("sum_qty"), col("sum_price_cents"), col("n_rows"))
      .orderBy("gid", "l_returnflag", "l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_unpivot" -> (q79Unpivot _),
    "q80_pivot" -> (q80Pivot _),
    "q81_grouping_sets" -> (q81GroupingSets _)
  )

  val oracles: Map[String, String] = Map(
    "q79_unpivot" ->
      """WITH wide AS (
        | SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS n_rows
        | FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, 'sum_qty' AS measure,
        |  sum_qty AS value FROM wide
        |UNION ALL SELECT l_returnflag, l_linestatus, 'sum_price_cents',
        |  sum_price_cents FROM wide
        |UNION ALL SELECT l_returnflag, l_linestatus, 'n_rows',
        |  n_rows FROM wide
        |ORDER BY l_returnflag, l_linestatus, measure""".stripMargin,
    "q80_pivot" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        | CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        | CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view",
        | CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        | CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS "error"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q81_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
        |   AS BIGINT) AS gid,
        | CAST(sum(l_quantity)  AS BIGINT) AS sum_qty,
        | CAST(sum(round(l_extendedprice * 100)) AS BIGINT)
        |   AS sum_price_cents,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin
  )
}
