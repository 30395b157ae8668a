package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Relational operator surface over the TPC-H-ish star schema.
  *
  * The reference (`22130010/Data-Warehouse-opensky`) declares — but never
  * implements — warehouse/aggregate/data-mart stages (architecture
  * diagram stages 4–6; see SURVEY.md §2.8). This module supplies that
  * declared surface with idiomatic Spark: declarative DataFrame plans so
  * Catalyst does pushdown/pruning/join-selection, explicit `broadcast`
  * on dimension tables, window functions for top-k/running state, and
  * fixed-point integer aggregation (see [[Det]]) for both oracle
  * determinism and 100 TB efficiency.
  *
  * Every query here has a matching ANSI-SQL oracle in
  * [[Relational.oracles]] with IDENTICAL column names and a unique,
  * fully-pinned ORDER BY (explicit NULLS placement) so results are
  * hash-comparable row-for-row.
  */
object Relational {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"
  private def ts(lit0: String): Column = to_timestamp(lit(lit0), TsFmt)

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: scan + filter + hash aggregate.
    * Scale: partial (map-side) aggregation collapses 6M rows/partition to
    * 6 groups before the shuffle — the shuffle moves O(groups), not rows. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= ts("1999-12-01 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        lsum(col("l_quantity")).as("sum_qty"),
        lsum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
        lsum(fixed(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
          .as("sum_disc_price_e4"),
        lsum(fixed(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")), 6)).as("sum_charge_e6"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------- q02
  /** TPC-H Q6-style selective scan: every predicate must reach the
    * parquet reader (`PushedFilters`), and only 4 of 11 columns are read. */
  def q02SelectiveScan(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        lsum(fixed(col("l_extendedprice") * col("l_discount"), 4))
          .as("revenue_e4"),
        count(lit(1)).as("n_rows"))
  }

  // ---------------------------------------------------------------- q03
  /** Star join: fact `orders` ⋈ dim `customer` ⋈ tiny dims nation/region.
    * nation+region are broadcast (no shuffle); the orders⋈customer join
    * shuffles on the key — at 100 TB AQE picks SMJ/shuffled-hash and
    * handles skew. Revenue rolled up per nation. */
  def q03RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    o.select(col("o_custkey"), cents(col("o_totalprice")).as("cents"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(lsum(col("cents")).as("revenue_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  // ---------------------------------------------------------------- q132
  /** Top-N for the q132 report. */
  val TopNOther = 10

  /** q132: top-N-plus-OTHER rollup — revenue by nation with everything
    * past rank [[TopNOther]] lumped into one 'OTHER' row, the
    * presentation rollup behind every BI "top 10 + rest" chart. Rank
    * is over the aggregated K-nation frame (revenue desc, name
    * tie-break), so the window moves K rows, never data; the regroup
    * is a second pass over the same K rows.
    *
    * Scale shape: the data-sized work is exactly q03's aggregation;
    * everything after it is constant-sized. */
  def topNOther(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_custkey"), cents(col("o_totalprice")).as("cents"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(lsum(col("cents")).as("revenue_cents"),
        count(lit(1)).as("n_orders"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("revenue_cents").desc, col("n_name").asc)
    base.withColumn("rk", row_number().over(w))
      .select(
        when(col("rk") <= TopNOther, col("n_name")).otherwise(lit("OTHER"))
          .as("bucket"),
        col("revenue_cents"), col("n_orders"))
      .groupBy("bucket")
      .agg(sum("revenue_cents").cast("long").as("revenue_cents"),
        sum("n_orders").cast("long").as("n_orders"))
      .orderBy(col("revenue_cents").desc, col("bucket").asc)
  }

  // ---------------------------------------------------------------- q04
  /** TPC-H Q3-style shipping priority: large-large join then top-10 via
    * TakeOrderedAndProject (no global sort — each partition keeps 10). */
  def q04TopUrgentOrders(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    li.filter(col("l_shipdate") > ts("1997-06-30 00:00:00"))
      .join(o.filter(col("o_orderdate") < ts("1997-06-30 00:00:00"))
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(lsum(fixed(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .as("revenue_e4"))
      .select(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"),
        col("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey").asc)
      .limit(10)
  }

  // ---------------------------------------------------------------- q05
  /** Left-semi join (EXISTS): customers with ≥1 open order. Only the
    * join key crosses the shuffle from the probe side. */
  def q05SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o.filter(col("o_orderstatus") === "O").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q06
  /** Left-anti join (NOT EXISTS): customers with no in-progress order. */
  def q06AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o.filter(col("o_orderstatus") === "P").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q07
  /** Top-k per group via ranking window: top-3 orders per customer.
    * One shuffle on the partition key; rank computed streaming per
    * partition — no driver involvement, scales with executors. */
  def q07TopPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).cast("long").as("totalprice_cents"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("totalprice_cents").desc, col("o_orderkey").asc))
        .cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  // ---------------------------------------------------------------- q08
  /** Running-state window: per-customer running order count/sum, previous
    * order date and day gap (lag). ROWS frame pinned explicitly. */
  def q08RunningTotals(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_date").asc, col("o_orderkey").asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        cents(col("o_totalprice")).as("cents"))
      .withColumn("run_n", count(lit(1)).over(wf))
      .withColumn("run_cents", sum(col("cents")).over(wf).cast("long"))
      .withColumn("prev_date", lag(col("order_date"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("order_date"), col("prev_date")).cast("long"))
      .select("o_custkey", "o_orderkey", "order_date", "run_n", "run_cents",
        "prev_date", "gap_days")
      .orderBy("o_custkey", "o_orderkey")
  }

  // ---------------------------------------------------------------- q09
  /** Global top-k: TakeOrderedAndProject, never a full sort at scale. */
  def q09GlobalTopK(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(col("o_orderkey"),
        cents(col("o_totalprice")).cast("long").as("totalprice_cents"),
        col("o_orderstatus"))
      .orderBy(col("totalprice_cents").desc, col("o_orderkey").asc)
      .limit(20)
  }

  // ---------------------------------------------------------------- q10
  /** Distinct aggregation: per market segment, exact distinct nations +
    * balance roll-up. countDistinct expands to a two-phase aggregate. */
  def q10DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    c.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        lsum(cents(col("c_acctbal"))).as("acctbal_cents"))
      .orderBy("c_mktsegment")
  }

  // ---------------------------------------------------------------- q11
  /** Set operations (INTERSECT / EXCEPT / UNION over customer-key sets)
    * computed in ONE pass: per-customer membership flags for each status
    * set, then the three set-operation tags derived with `when`+`explode`.
    * A literal intersect/except/union formulation re-evaluates each side
    * (~6 scans of `orders`); this shape is one scan + one shuffle, which
    * is what survives a 100× scale-up. */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val flags = o.filter(col("o_orderstatus").isin("O", "F"))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("in_o"),
        max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("in_f"))
    // every flagged customer is in the union; intersect/except per flags
    flags.select(col("o_custkey"), explode(array(
        when(col("in_o") === 1 && col("in_f") === 1, lit("intersect")),
        when(col("in_o") === 1 && col("in_f") === 0, lit("except")),
        lit("union"))).as("op"))
      .filter(col("op").isNotNull)
      .select("op", "o_custkey")
      .orderBy("op", "o_custkey")
  }

  // ---------------------------------------------------------------- q12
  /** ROLLUP (region, nation): hierarchy totals with explicit GROUPING
    * flags; NULLS FIRST pinned on the grouped keys. */
  def q12Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        lsum(cents(col("c_acctbal"))).as("acctbal_cents"),
        grouping(col("r_name")).cast("long").as("g_r"),
        grouping(col("n_name")).cast("long").as("g_n"))
      .select("r_name", "n_name", "g_r", "g_n", "n_cust", "acctbal_cents")
      .orderBy(col("g_r").asc, col("g_n").asc,
        col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  // ---------------------------------------------------------------- q13
  /** CUBE over (returnflag, linestatus): all 4 grouping-set combos. */
  def q13Cube(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), lsum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_f"),
        grouping(col("l_linestatus")).cast("long").as("g_s"))
      .select("l_returnflag", "l_linestatus", "g_f", "g_s", "n_rows",
        "sum_qty")
      .orderBy(col("g_f").asc, col("g_s").asc,
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  // ---------------------------------------------------------------- q14
  /** Conditional aggregation (TPC-H Q14-style): promo revenue share per
    * ship month. `part` grows with scale factor (~20M rows at sf100), so
    * it is NOT broadcast-pinned — AQE picks broadcast while it fits and
    * falls back to a shuffled join at scale. (nation/region broadcasts
    * elsewhere are fine: those are fixed 25/5-row dims.) */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).select("p_partkey", "p_type")
    val rev = fixed(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date")
        .as("ship_month"))
      .agg(
        lsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
          .as("promo_rev_e4"),
        lsum(rev).as("total_rev_e4"),
        count(lit(1)).as("n_rows"))
      .orderBy("ship_month")
  }

  // ---------------------------------------------------------------- q15
  /** Scalar string kernel: LIKE filter + substr/upper/length/concat —
    * all codegen'd builtins, no UDFs. */
  def q15StringFuncs(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    p.filter(col("p_brand").like("Brand#1%"))
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- q16
  /** Correlated-aggregate subquery (TPC-H Q17 shape), decorrelated as a
    * join against a per-key aggregate — the plan Catalyst would produce
    * for the correlated SQL, written directly. */
  def q16SmallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val thresholds = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_threshold"))
    li.join(thresholds, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(lsum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n_rows"))
  }

  // ---------------------------------------------------------------- q17
  /** TPC-H Q13: customer order-count distribution — left outer join +
    * two-level aggregation. */
  def q17OrderCountDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_custkey")
    val o = Tables.orders(s, dir).select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("c_count"))
  }

  // ---------------------------------------------------------------- q18
  /** Event-time daily roll-up: date_trunc + multi-measure aggregate over
    * the append-only events table (the batch shape of the streaming
    * windowed aggregation in graft.streaming). */
  def q18EventsDaily(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        lsum(cents(col("value"))).as("value_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("day", "event_type")
  }

  // ---------------------------------------------------------------- q19
  /** JSON scalar extraction from the `props` payload column, then
    * aggregate — get_json_object is codegen'd, no UDF. */
  def q19JsonExtract(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
        count(col("k")).as("n_k"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q20
  /** Sessionization: 30-minute-gap sessions per user via lag + running
    * conditional sum — the classic one-shuffle window formulation. */
  def q20Sessionize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    e.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800000000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q21
  /** As-of lookup: for every event, the most recent signup at-or-before
    * it for the same user — last_value(... IGNORE NULLS) over a ROWS
    * frame; the single-table as-of-join formulation that needs only one
    * shuffle on user_id. */
  def q21AsOfLastSignup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("last_signup_us",
        last(when(col("event_type") === "signup", unix_micros(col("ts"))),
          ignoreNulls = true).over(w))
      .select("event_id", "user_id", "event_type", "last_signup_us")
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q45
  /** The same as-of lookup as q21, but through graft's CUSTOM as-of
    * join operator ([[graft.plans.AsOfJoin]]): left = all events,
    * right = the distinct (user_id, ts) signup instants from a second
    * scan. Plans as one Exchange+Sort per side and a streamed
    * per-partition merge; the DuckDB oracle states the native
    * `ASOF LEFT JOIN`, so the operator's semantics are pinned against
    * an independent engine's as-of implementation — and q21 pins the
    * window formulation of the identical answer. */
  def q45AsOfJoinCustom(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select("event_id", "user_id", "event_type", "ts")
    // separate scan → fresh attribute instances for the right side
    val signups = Tables.events(s, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"))
      .distinct()
    graft.plans.AsOf.join(e, signups, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "signup_ts")
      .toDF("event_id", "user_id", "event_type", "ts", "r_user_id", "signup_ts")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("signup_ts")).as("last_signup_us"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q46
  /** Forward as-of through the custom operator: for every event, the
    * NEXT signup at-or-after it per user (first-at-or-after — pandas
    * merge_asof direction="forward"). Oracle: DuckDB ASOF LEFT JOIN
    * with the inequality reversed. */
  def q46AsOfForward(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select("event_id", "user_id", "event_type", "ts")
    val signups = Tables.events(s, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"))
      .distinct()
    graft.plans.AsOf.join(e, signups, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "signup_ts", direction = "forward")
      .toDF("event_id", "user_id", "event_type", "ts", "r_user_id", "signup_ts")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("signup_ts")).as("next_signup_us"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q66
  /** Time-series resampling with forward fill: an hourly tick grid per
    * user (one global span, generated — no data shuffle to build it),
    * each tick carrying the user's last event at-or-before it via the
    * custom as-of operator. The classic gap-filling query every
    * time-series warehouse runs, and the second independent workload
    * planning through [[graft.plans.AsOfJoin]] — with `tieBreak` on
    * event_id so equal-timestamp events (impossible in this data,
    * enforced deterministic anyway) can never make a re-run differ.
    * Oracle: DuckDB's native ASOF LEFT JOIN against its own
    * generate_series grid. */
  def q66Resample(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        Det.cents(col("value")).cast("long").as("value_cents"))
    val bounds = Tables.events(s, dir)
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
    val grid = Tables.events(s, dir).select("user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
          .as("tick"))
    graft.plans.AsOf.join(grid, e, keys = Seq("user_id"),
        leftTs = "tick", rightTs = "ts", tieBreak = Seq("event_id"))
      .toDF("user_id", "tick", "r_user_id", "ts", "event_id", "value_cents")
      .select(col("user_id"), unix_micros(col("tick")).as("tick_us"),
        unix_micros(col("ts")).as("event_us"), col("value_cents"))
      .orderBy("user_id", "tick_us")
  }

  // ---------------------------------------------------------------- q119
  /** q66's grid with LINEAR INTERPOLATION instead of forward fill:
    * each hourly tick carries the value interpolated between the
    * user's last event at-or-before and first event at-or-after —
    * both through the custom as-of operator (backward + forward
    * pass over the same grid). The fraction is integer ppm
    * ((tick−t_prev)·10⁶ div (t_next−t_prev), non-negative) and the
    * delta term uses truncating div, identical in both engines for
    * either sign of the delta. Edges extrapolate flat (prev-only →
    * prev; next-only → next); an event exactly on the tick makes
    * prev = next and short-circuits to its value (division guard).
    *
    * Numeric bound: (tick−t_prev)·10⁶ stays in 64-bit while the
    * largest per-user event gap is < ~106 days — gaps, not corpus
    * size, bound the product, so the ppm discipline holds at any
    * volume (a wider-spanned deployment drops to milli fractions).
    *
    * Scale shape: two as-of merges, each one Exchange+Sort per side
    * on user_id (the q66 argument, twice); the grid build reuses
    * q66's broadcast-bounds pattern (no data shuffle). */
  def q119Interpolate(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        Det.cents(col("value")).cast("long").as("value_cents"))
    val bounds = Tables.events(s, dir)
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
    val grid = Tables.events(s, dir).select("user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
          .as("tick"))
    val back = graft.plans.AsOf.join(grid, e, keys = Seq("user_id"),
        leftTs = "tick", rightTs = "ts", tieBreak = Seq("event_id"))
      .toDF("user_id", "tick", "r_user_id", "ts", "event_id", "value_cents")
      .select(col("user_id"), col("tick"),
        unix_micros(col("ts")).as("prev_us"), col("value_cents").as("prev_cents"))
    val fwd = graft.plans.AsOf.join(back, e, keys = Seq("user_id"),
        leftTs = "tick", rightTs = "ts", direction = "forward",
        tieBreak = Seq("event_id"))
      .toDF("user_id", "tick", "prev_us", "prev_cents",
        "r_user_id", "ts", "event_id", "next_cents")
      .select(col("user_id"), unix_micros(col("tick")).as("tick_us"),
        col("prev_us"), col("prev_cents"),
        unix_micros(col("ts")).as("next_us"), col("next_cents"))
    fwd.withColumn("interp_cents",
        when(col("prev_us").isNull, col("next_cents"))
          .when(col("next_us").isNull, col("prev_cents"))
          .when(col("next_us") === col("prev_us"), col("prev_cents"))
          .otherwise(col("prev_cents") + expr(
            "(next_cents - prev_cents) * ((tick_us - prev_us) * 1000000" +
              " div (next_us - prev_us)) div 1000000")))
      .select("user_id", "tick_us", "prev_us", "next_us", "interp_cents")
      .orderBy("user_id", "tick_us")
  }

  // ---------------------------------------------------------------- q22
  /** Union + exact dedup: two overlapping slices, distinct, aggregate. */
  def q22UnionDedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val a = e.filter(col("value") > 100)
    val b = e.filter(col("event_type") === "view")
    a.unionByName(b).dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_selective_scan" -> (q02SelectiveScan _),
    "q03_revenue_by_nation" -> (q03RevenueByNation _),
    "q04_top_urgent_orders" -> (q04TopUrgentOrders _),
    "q05_semi_join" -> (q05SemiJoin _),
    "q06_anti_join" -> (q06AntiJoin _),
    "q07_top_per_customer" -> (q07TopPerCustomer _),
    "q08_running_totals" -> (q08RunningTotals _),
    "q09_global_topk" -> (q09GlobalTopK _),
    "q10_distinct_agg" -> (q10DistinctAgg _),
    "q11_set_ops" -> (q11SetOps _),
    "q12_rollup" -> (q12Rollup _),
    "q13_cube" -> (q13Cube _),
    "q14_promo_share" -> (q14PromoShare _),
    "q15_string_funcs" -> (q15StringFuncs _),
    "q16_small_qty_revenue" -> (q16SmallQuantityRevenue _),
    "q17_order_count_distribution" -> (q17OrderCountDistribution _),
    "q18_events_daily" -> (q18EventsDaily _),
    "q19_json_extract" -> (q19JsonExtract _),
    "q20_sessionize" -> (q20Sessionize _),
    "q21_asof_last_signup" -> (q21AsOfLastSignup _),
    "q22_union_dedup" -> (q22UnionDedup _),
    "q45_asof_custom" -> (q45AsOfJoinCustom _),
    "q46_asof_forward" -> (q46AsOfForward _),
    "q66_resample_ffill" -> (q66Resample _),
    "q119_interp_resample" -> (q119Interpolate _),
    "q132_topn_other" -> (topNOther _)
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS sum_base_price_cents,
        | CAST(sum(round(l_extendedprice*(1-l_discount)*10000)) AS BIGINT) AS sum_disc_price_e4,
        | CAST(sum(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000)) AS BIGINT) AS sum_charge_e6,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_selective_scan" ->
      """SELECT CAST(sum(round(l_extendedprice*l_discount*10000)) AS BIGINT) AS revenue_e4,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | CAST(sum(round(o_totalprice*100)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q04_top_urgent_orders" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        | CAST(sum(round(l_extendedprice*(1-l_discount)*10000)) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_e4 DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q07_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, totalprice_cents, rn FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey ASC) AS rn
        | FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q08_running_totals" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | count(*) OVER w AS run_n,
        | CAST(sum(round(o_totalprice*100)) OVER w AS BIGINT) AS run_cents,
        | lag(CAST(o_orderdate AS DATE), 1) OVER
        |  (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC) AS prev_date,
        | date_diff('day', lag(CAST(o_orderdate AS DATE), 1) OVER
        |  (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC),
        |  CAST(o_orderdate AS DATE)) AS gap_days
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q09_global_topk" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents,
        | o_orderstatus
        |FROM orders
        |ORDER BY totalprice_cents DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "q10_distinct_agg" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | count(DISTINCT c_nationkey) AS n_nations,
        | CAST(sum(round(c_acctbal*100)) AS BIGINT) AS acctbal_cents
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q11_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        | b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT 'intersect' AS op, o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL
        |SELECT 'except' AS op, o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |UNION ALL
        |SELECT 'union' AS op, o_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
        |ORDER BY op, o_custkey""".stripMargin,
    "q12_rollup" ->
      """SELECT r_name, n_name, CAST(GROUPING(r_name) AS BIGINT) AS g_r, CAST(GROUPING(n_name) AS BIGINT) AS g_n,
        | count(*) AS n_cust,
        | CAST(sum(round(c_acctbal*100)) AS BIGINT) AS acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY g_r ASC, g_n ASC, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q13_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(GROUPING(l_returnflag) AS BIGINT) AS g_f,
        | CAST(GROUPING(l_linestatus) AS BIGINT) AS g_s, count(*) AS n_rows,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_f ASC, g_s ASC, l_returnflag ASC NULLS FIRST,
        | l_linestatus ASC NULLS FIRST""".stripMargin,
    "q14_promo_share" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
        | CAST(sum(CASE WHEN p_type = 'PROMO'
        |   THEN round(l_extendedprice*(1-l_discount)*10000) ELSE 0 END) AS BIGINT) AS promo_rev_e4,
        | CAST(sum(round(l_extendedprice*(1-l_discount)*10000)) AS BIGINT) AS total_rev_e4,
        | count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY ship_month
        |ORDER BY ship_month""".stripMargin,
    "q15_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        | substring(p_name, 1, 5) AS prefix5, CAST(length(p_name) AS BIGINT) AS name_len,
        | concat_ws('/', p_brand, p_type) AS brand_type
        |FROM part WHERE p_brand LIKE 'Brand#1%'
        |ORDER BY p_partkey""".stripMargin,
    "q16_small_qty_revenue" ->
      """SELECT CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS sum_price_cents,
        | count(*) AS n_rows
        |FROM lineitem JOIN (
        |  SELECT l_partkey AS t_partkey, 0.2*avg(l_quantity) AS qty_threshold
        |  FROM lineitem GROUP BY l_partkey) t
        |ON l_partkey = t_partkey
        |WHERE l_quantity < qty_threshold""".stripMargin,
    "q17_order_count_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY c_count""".stripMargin,
    "q18_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        | count(*) AS n,
        | CAST(sum(round(value*100)) AS BIGINT) AS value_cents,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,
    "q19_json_extract" ->
      """SELECT event_type,
        | CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        | count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q20_sessionize" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(new_session) AS BIGINT) AS n_sessions
        |FROM (
        | SELECT user_id,
        |  CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        | FROM (
        |  SELECT user_id, epoch_us(ts) AS us,
        |   lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
        |  FROM events) t1) t2
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q21_asof_last_signup" ->
      """SELECT event_id, user_id, event_type,
        | last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_us
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q45_asof_custom" ->
      """SELECT e.event_id, e.user_id, e.event_type,
        | epoch_us(s.ts) AS last_signup_us
        |FROM events e ASOF LEFT JOIN
        | (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'signup') s
        | ON e.user_id = s.user_id AND s.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,
    "q46_asof_forward" ->
      """SELECT e.event_id, e.user_id, e.event_type,
        | epoch_us(s.ts) AS next_signup_us
        |FROM events e ASOF LEFT JOIN
        | (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'signup') s
        | ON e.user_id = s.user_id AND s.ts >= e.ts
        |ORDER BY e.event_id""".stripMargin,
    "q66_resample_ffill" ->
      """WITH b AS (
        | SELECT date_trunc('hour', min(ts)) AS lo,
        |        date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (
        | SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS tick
        | FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN b),
        |e AS (SELECT user_id, ts, event_id,
        |      CAST(round(value * 100) AS BIGINT) AS value_cents FROM events)
        |SELECT g.user_id, epoch_us(g.tick) AS tick_us,
        | epoch_us(e.ts) AS event_us, e.value_cents
        |FROM grid g ASOF LEFT JOIN e
        | ON g.user_id = e.user_id AND e.ts <= g.tick
        |ORDER BY g.user_id, tick_us""".stripMargin,
    "q119_interp_resample" ->
      s"""WITH b AS (
        | SELECT date_trunc('hour', min(ts)) AS lo,
        |        date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (
        | SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS tick
        | FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN b),
        |e AS (SELECT user_id, ts,
        |      CAST(round(value * 100) AS BIGINT) AS value_cents FROM events),
        |bk AS (
        | SELECT g.user_id, g.tick, epoch_us(p.ts) AS prev_us,
        |  p.value_cents AS prev_cents
        | FROM grid g ASOF LEFT JOIN e p
        |  ON g.user_id = p.user_id AND p.ts <= g.tick),
        |fw AS (
        | SELECT bk.user_id, epoch_us(bk.tick) AS tick_us, bk.prev_us,
        |  bk.prev_cents, epoch_us(n.ts) AS next_us, n.value_cents AS next_cents
        | FROM bk ASOF LEFT JOIN e n
        |  ON bk.user_id = n.user_id AND n.ts >= bk.tick)
        |SELECT user_id, tick_us, prev_us, next_us,
        | CASE WHEN prev_us IS NULL THEN next_cents
        |      WHEN next_us IS NULL THEN prev_cents
        |      WHEN next_us = prev_us THEN prev_cents
        |      ELSE prev_cents + (next_cents - prev_cents)
        |        * ${OracleSql.ppmSql("(tick_us - prev_us)", "(next_us - prev_us)")} // 1000000
        | END AS interp_cents
        |FROM fw ORDER BY user_id, tick_us""".stripMargin,
    "q132_topn_other" ->
      s"""WITH base AS (
         | SELECT n_name,
         |  CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS revenue_cents,
         |  count(*) AS n_orders
         | FROM orders
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | GROUP BY n_name),
         |r AS (
         | SELECT *, row_number() OVER
         |   (ORDER BY revenue_cents DESC, n_name) AS rk
         | FROM base)
         |SELECT CASE WHEN rk <= $TopNOther THEN n_name ELSE 'OTHER' END AS bucket,
         | CAST(sum(revenue_cents) AS BIGINT) AS revenue_cents,
         | CAST(sum(n_orders) AS BIGINT) AS n_orders
         |FROM r GROUP BY 1
         |ORDER BY revenue_cents DESC, bucket""".stripMargin,
    "q22_union_dedup" ->
      """SELECT event_type, count(*) AS n FROM (
        | SELECT * FROM events WHERE value > 100
        | UNION
        | SELECT * FROM events WHERE event_type = 'view') t
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
