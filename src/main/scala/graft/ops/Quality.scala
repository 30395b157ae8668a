package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality operators — the Deequ/dbt-test shape every warehouse
  * runs before trusting a load: column profiling (q62) and declarative
  * constraint validation (q63).
  *
  * Scale shape: q62 is TWO passes over the table — null counts,
  * distinct counts and numeric/date bounds from one hash aggregate
  * (the multi-distinct Expand, same machinery as q10), string bounds
  * from a second grouping-free pass over just the string columns (see
  * [[profile]] for why mixing them demotes the whole Expand to sorted
  * aggregation), then a `stack` unpivot of the joined one-row result;
  * at petabyte scale the exact distincts swap for the q39 HLL
  * sketches without changing the frame. q63's row rules are one conditional aggregate over one scan;
  * the referential rule is a broadcast-able anti-join — violations,
  * never full joins, cross the network. */
object Quality {

  /** (column, renderer) — min/max aggregate the NATIVE column and the
    * renderer stringifies the RESULT (engine-identically: integers/
    * dates/strings cast directly, doubles via exact cents). Rendering
    * before aggregating would make the bounds lexicographic —
    * min('10','2') = '10' — silently wrong for every multi-digit
    * numeric column, and the oracle mirror would agree. Renderers are
    * monotone, so render(min(c)) ≡ the true minimum's rendering. */
  private def profiled: Seq[(String, Column, Column => Column)] = Seq(
    ("o_orderkey", col("o_orderkey"), (c: Column) => c.cast("string")),
    ("o_custkey", col("o_custkey"), (c: Column) => c.cast("string")),
    ("o_orderstatus", col("o_orderstatus"), (c: Column) => c),
    ("o_totalprice", col("o_totalprice"),
      (c: Column) => Det.cents(c).cast("long").cast("string")),
    ("o_orderdate", col("o_orderdate"), (c: Column) => c.cast("string")),
    ("o_orderpriority", col("o_orderpriority"), (c: Column) => c))

  /** Column profile of `orders` (q62): per column — nulls, exact
    * distincts, min/max in a canonical string rendering — plus the
    * table row count on every row.
    *
    * The aggregation is SPLIT in two so the heavy pass stays hash-
    * based: a `min`/`max` whose buffer is a string is not a mutable
    * aggregation-buffer type, and ONE such aggregate demotes the whole
    * multi-distinct Expand to SortAggregate — measured at sf0.1 that
    * sorted the 7×-expanded input three times (SortExec×3,
    * SortAggregateExec×4) for 3.4 s isolated. Splitting gives
    *   1. the Expand pass (null counts, exact distincts, numeric/date
    *      bounds — all mutable buffers) as a pure HashAggregate, and
    *   2. the string bounds as a SEPARATE grouping-free aggregate —
    *      with no grouping keys SortAggregate needs no SortExec, so
    *      it is one cheap streaming pass over two dictionary-encoded
    *      columns,
    * then joins the two single-row frames on a literal key (broadcast
    * hash join, not a cartesian). Same two-scan shape at 100 TB: the
    * second scan reads only the two string columns. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    // Which columns route to the second pass is derived from the ACTUAL
    // column type, not a name list: a string column added to `profiled`
    // without updating a hand-kept set would silently demote the main
    // Expand back to SortAggregate (the 3.4 s regression the split
    // fixed).
    val stringBuffered = profiled.collect {
      case (name, _, _) if orders.schema(name).dataType ==
        org.apache.spark.sql.types.StringType => name
    }.toSet
    val hashAggs = profiled.flatMap { case (name, c, render) =>
      Seq(
        count(lit(1)).minus(count(c)).cast("long").as(s"nn_$name"),
        countDistinct(c).cast("long").as(s"nd_$name")) ++
        (if (stringBuffered(name)) Nil
         else Seq(
           render(min(c)).as(s"mn_$name"),
           render(max(c)).as(s"mx_$name")))
    }
    val main = orders
      .agg(count(lit(1)).cast("long").as("n_rows"), hashAggs: _*)
    val strAggs = profiled.collect {
      case (name, c, render) if stringBuffered(name) =>
        Seq(render(min(c)).as(s"mn_$name"), render(max(c)).as(s"mx_$name"))
    }.flatten
    // With no string columns the second pass (and its join) vanishes —
    // also keeps strAggs.head total.
    val one =
      if (strAggs.isEmpty) main
      else {
        val strBounds = orders.agg(strAggs.head, strAggs.tail: _*)
        main.withColumn("jk", lit(1))
          .join(broadcast(strBounds.withColumn("jk", lit(1))), "jk")
      }
    val stackArgs = profiled.map { case (name, _, _) =>
      s"'$name', nn_$name, nd_$name, mn_$name, mx_$name"
    }.mkString(", ")
    one.selectExpr("n_rows",
      s"stack(${profiled.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_repr, max_repr)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")
      .orderBy("col_name")
  }

  /** TPC-H-shaped rule set for q63. */
  val QuantityMin = 1.0
  val QuantityMax = 50.0
  val DiscountMax = 0.11

  /** Constraint validation (q63): violation counts per declared rule —
    * range rules as conditional sums over one lineitem scan, the
    * referential rule as an anti-join against orders. Zero counts on
    * clean data are the point: the spec proves the rules fire on
    * constructed dirty rows. */
  def constraints(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    def viol(name: String, bad: Column): Column =
      struct(lit(name).as("rule"),
        sum(bad.cast("long")).cast("long").as("n_violations"))
    val rowRules = l.agg(
      viol("quantity_range",
        !(col("l_quantity") >= QuantityMin && col("l_quantity") <= QuantityMax)
          || col("l_quantity").isNull).as("r1"),
      viol("discount_range",
        !(col("l_discount") >= 0.0 && col("l_discount") <= DiscountMax)
          || col("l_discount").isNull).as("r2"),
      viol("price_positive",
        !(col("l_extendedprice") > 0.0) || col("l_extendedprice").isNull).as("r3"))
      .select(explode(array(col("r1"), col("r2"), col("r3"))).as("v"))
      .select(col("v.rule").as("rule"), col("v.n_violations").as("n_violations"))
    val orphan = l.select(col("l_orderkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit("orderkey_exists").as("rule"), col("n_violations"))
    rowRules.unionByName(orphan).orderBy("rule")
  }

  // ---------------------------------------------------------------- q78
  /** q78: rank-exact IQR outlier detection per group — the robust-
    * stats screen (Tukey fences) a pipeline runs on numeric columns
    * before trusting them. Quartiles are defined by RANK, not
    * interpolation: q1 = the value at rank ⌈n/4⌉, q3 at ⌈3n/4⌉ in the
    * cents-integer sort order — a value the sorted multiset determines
    * exactly, so both engines agree bit-for-bit (interpolated
    * `percentile`/`quantile_cont` would race doubles in the last ulp).
    * Fences at ±3·IQR/2; all arithmetic on non-negative integers, so
    * truncating div ≡ floor div across engines.
    *
    * Scale shape: the rank pass is one window shuffle on the group
    * key; group counts and the quartile pick reuse that exchange
    * (same key); the fence count is a second scan joined to the
    * K-group quartile frame — broadcast-sized by construction (one
    * row per group). No global sort anywhere. */
  def iqrOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), Det.cents(col("value")).cast("long").as("cents"))
    // NULLS LAST pinned: Spark's ASC default is NULLS FIRST, DuckDB's
    // is NULLS LAST — a single null value would shift every real rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("cents").asc_nulls_last)
    val quart = e.withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .groupBy("event_type", "n")
      .agg(
        max(when(col("r") === expr("(n + 3) div 4"), col("cents")))
          .as("q1_cents"),
        max(when(col("r") === expr("(3 * n + 3) div 4"), col("cents")))
          .as("q3_cents"))
      .withColumn("iqr_cents", col("q3_cents") - col("q1_cents"))
    e.join(broadcast(quart), "event_type")
      .groupBy("event_type", "n", "q1_cents", "q3_cents", "iqr_cents")
      .agg(
        sum((col("cents") < col("q1_cents") - expr("(3 * iqr_cents) div 2"))
          .cast("long")).as("n_low"),
        sum((col("cents") > col("q3_cents") + expr("(3 * iqr_cents) div 2"))
          .cast("long")).as("n_high"))
      .select("event_type", "n", "q1_cents", "q3_cents", "iqr_cents",
        "n_low", "n_high")
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q90
  /** q90: per-user rolling weighted mean (EWMA with a 4-tap integer
    * kernel) over the event stream — the smoothing pass a metrics
    * pipeline runs before anomaly thresholds. True EWMA is a
    * recurrence (not windowable); the standard distributed form is a
    * finite kernel: weights 8/4/2/1 over the last 4 events, weighted
    * mean in milli-cents by integer division. Missing lags (stream
    * head) drop out of numerator AND denominator, so the first events
    * are exact short-kernel means, not zero-padded.
    *
    * Scale shape: ONE shuffle on user_id serves all four lag()
    * columns (same window partitioning+sort); arithmetic is per-row.
    * All operands non-negative (cents of a non-negative metric), so
    * Spark `div` ≡ DuckDB `//`. */
  private val WavgWeights = Seq(8L, 4L, 2L, 1L)

  def rollingWavg(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
      Det.cents(col("value")).cast("long").as("cents"))
    val lags = WavgWeights.zipWithIndex.map { case (wt, i) =>
      (if (i == 0) col("cents") else lag(col("cents"), i).over(w), wt)
    }
    val num = lags.map { case (c, wt) => coalesce(c * wt, lit(0L)) }
      .reduce(_ + _)
    val den = lags.map { case (c, wt) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    e.withColumn("wnum", num * 1000L).withColumn("wden", den)
      .withColumn("wavg_milli", expr("wnum div wden"))
      .select("user_id", "event_id", "us", "cents", "wavg_milli")
      .orderBy("user_id", "us", "event_id")
  }

  // ---------------------------------------------------------------- q117
  /** q117: per-group winsorized mean — clamp each value into the
    * rank-exact [p05, p95] band before averaging, the robust
    * aggregation a metrics pipeline uses where a single corrupt row
    * would drag a plain mean. Bounds are defined by RANK like q78's
    * quartiles (lo = value at rank ⌈n/20⌉, hi at ⌈19n/20⌉ in cents
    * order), so both engines agree exactly; the mean is emitted in
    * milli-cents by truncating div over non-negative operands.
    *
    * Scale shape: identical to q78 — one window shuffle on the group
    * key to rank, the bound pick reuses that exchange, and the clamp
    * pass joins the K-group bounds frame by broadcast. */
  def winsorizedMean(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), Det.cents(col("value")).cast("long").as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("cents").asc_nulls_last)
    val bounds = e.withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .groupBy("event_type", "n")
      .agg(
        max(when(col("r") === expr("(n + 19) div 20"), col("cents")))
          .as("lo_cents"),
        max(when(col("r") === expr("(19 * n + 19) div 20"), col("cents")))
          .as("hi_cents"))
    e.join(broadcast(bounds), "event_type")
      .groupBy("event_type", "n", "lo_cents", "hi_cents")
      .agg(
        sum((col("cents") < col("lo_cents")).cast("long")).as("n_clipped_low"),
        sum((col("cents") > col("hi_cents")).cast("long")).as("n_clipped_high"),
        sum(greatest(least(col("cents"), col("hi_cents")), col("lo_cents")))
          .as("win_sum_cents"))
      .select(col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
        col("n_clipped_low"), col("n_clipped_high"),
        col("win_sum_cents").cast("long").as("win_sum_cents"),
        expr("win_sum_cents * 1000 div n").as("win_mean_milli"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q124
  /** q124: median-absolute-deviation outlier screen per group — the
    * robust scale estimator that, unlike q78's IQR, stays meaningful
    * when up to half the data is corrupt (50% breakdown point). Both
    * medians are rank-exact LOWER medians (the value at rank
    * ⌈n/2⌉ = (n+1) div 2 in sorted order — a value the multiset
    * determines, q78's argument), deviations are exact integer
    * |cents − median|, and the fence is the standard 3·MAD.
    *
    * Scale shape: two rank-window passes on the SAME group key (the
    * deviation pass reuses the first exchange's partitioning) + two
    * broadcast joins of the K-group median frames — q78's shape run
    * twice, no global sort. */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val gw = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col(valueCol).asc_nulls_last)
      df.withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(gw))
        .groupBy("event_type")
        .agg(max(when(col("r") === expr("(n + 1) div 2"), col(valueCol)))
          .as(out))
    }
    val e = Tables.events(s, dir)
      .select(col("event_type"), Det.cents(col("value")).cast("long").as("cents"))
    val med = lowerMedian(e, "cents", "med_cents")
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("ad", abs(col("cents") - col("med_cents")))
    val mad = lowerMedian(dev, "ad", "mad_cents")
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type", "med_cents", "mad_cents")
      .agg(count(lit(1)).as("n"),
        sum((col("ad") > col("mad_cents") * 3).cast("long")).as("n_outliers"),
        max("ad").cast("long").as("max_ad"))
      .select("event_type", "n", "med_cents", "mad_cents", "n_outliers", "max_ad")
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q128
  /** Anonymity threshold for the q128 privacy audit. */
  val KAnon = 5L

  /** q128: k-anonymity audit — the quasi-identifier combinations
    * (order status, priority, order month) shared by fewer than
    * [[KAnon]] rows, i.e. the cells where releasing the "aggregate"
    * would single out individuals. The governance check a pipeline
    * runs before publishing a cube; at 100 TB it is ONE hash
    * aggregation on the quasi-identifier key with map-side partials,
    * and only the (rare) risky cells come back. */
  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .groupBy("o_orderstatus", "o_orderpriority", "month")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < KAnon)
      .orderBy("o_orderstatus", "o_orderpriority", "month")

  // ---------------------------------------------------------------- q158
  /** Diversity threshold for the q158 privacy audit. */
  val LDiv = 3L

  /** q158: l-diversity audit — q128's sibling: a quasi-identifier
    * cell can be k-anonymous (≥ k rows) yet still leak if everyone in
    * it shares the same SENSITIVE value. Per (status, priority,
    * order month) cell: row count and the number of distinct
    * sensitive values (the ordering customer's nation), reporting
    * cells with fewer than [[LDiv]] distinct nations — where "we
    * published an aggregate" still reveals the attribute.
    *
    * Scale shape: one customer join keyed on the order's custkey
    * (AQE broadcasts the dim when it fits) and ONE hash aggregation
    * on the quasi-identifier key; the distinct-sensitive count rides
    * the same exchange as an Expand. Only risky cells return. */
  def lDiversity(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderstatus", "o_orderpriority", "month")
      .agg(count(lit(1)).cast("long").as("n"),
        countDistinct("c_nationkey").cast("long").as("l_distinct"))
      .filter(col("l_distinct") < LDiv)
      .orderBy("o_orderstatus", "o_orderpriority", "month")

  // ---------------------------------------------------------------- q129
  /** q129: cross-table totals reconciliation — per order status, how
    * many orders' stored `o_totalprice` agrees with the lineitem-
    * derived charge Σ price·(1−disc)·(1+tax), within a 1-cent
    * rounding slop. The referential AMOUNT check (q63 checks key
    * existence; this checks the money), and on this synthetic data a
    * deliberate total-mismatch detector. Charges accumulate in exact
    * per-row e6 fixed-point (q01's measure), orders without any
    * lineitem are counted separately, and all divs are non-negative.
    *
    * Scale shape: one groupBy on l_orderkey (the join's own key, so
    * the derived frame arrives pre-partitioned for the sort-merge
    * join) + a status-keyed census of the joined row — two data-sized
    * exchanges total, no window. */
  def totalsReconcile(s: SparkSession, dir: String): DataFrame = {
    val derived = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(Det.lsum(Det.fixed(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * (lit(1.0) + col("l_tax")), 6)).as("charge_e6"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        Det.cents(col("o_totalprice")).cast("long").as("total_cents"))
      .join(derived, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("diff_cents",
        abs(col("total_cents") - expr("charge_e6 div 10000")))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("charge_e6").isNull.cast("long")).as("n_no_items"),
        sum((col("diff_cents") >= 2).cast("long")).as("n_mismatch"),
        max("diff_cents").cast("long").as("max_diff_cents"))
      .orderBy("o_orderstatus")
  }

  // ---------------------------------------------------------------- q175
  /** Benford expected first-digit shares in ppm: round(1e6·log10(1+1/d))
    * for d = 1..9, embedded as exact literals (no engine log10 in the
    * query) — they sum to exactly 1 000 000. */
  val BenfordPpm: Seq[Long] = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L)

  /** q175: Benford first-digit audit — the classic anomaly/fraud
    * screen over order totals: the observed share of each leading
    * digit vs Benford's law, with the signed deviation. Synthetic or
    * fabricated amounts drift from the curve; the audit is one census.
    * (TPC-H-ish uniform totals WILL deviate — the deviation column is
    * the point, not a pass/fail.)
    *
    * Determinism: the first digit comes from the decimal string of
    * the integer cents (exact in both engines); expected shares are
    * precomputed integer literals, so no float ever enters.
    *
    * Scale shape: one hash agg to a 9-row census; shares divide by
    * the window total over those 9 rows. */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(s, dir)
      .select(Det.cents(col("o_totalprice")).cast("long").as("cents"))
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = BenfordPpm.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}L" }
      .mkString("CASE digit ", " ", " END")
    digits
      .withColumn("n_total", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .select(col("digit"), col("n").cast("long").as("n"),
        expr("n * 1000000 div n_total").as("share_ppm"),
        expr(expected).as("benford_ppm"))
      .withColumn("dev_ppm", col("share_ppm") - col("benford_ppm"))
      .orderBy("digit")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q175_benford_audit" -> (benfordAudit _),
    "q62_data_profile" -> (profile _),
    "q63_constraints" -> (constraints _),
    "q78_iqr_outliers" -> (iqrOutliers _),
    "q90_rolling_wavg" -> (rollingWavg _),
    "q117_winsorized_mean" -> (winsorizedMean _),
    "q124_mad_outliers" -> (madOutliers _),
    "q128_k_anonymity" -> (kAnonymity _),
    "q129_totals_reconcile" -> (totalsReconcile _),
    "q158_l_diversity" -> (lDiversity _)
  )

  val oracles: Map[String, String] = Map(
    "q175_benford_audit" -> {
      val expected = BenfordPpm.zipWithIndex
        .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }
        .mkString("CASE digit ", " ", " END")
      s"""WITH c AS (
         | SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
         |   AS VARCHAR), 1, 1) AS BIGINT) AS digit
         | FROM orders),
         |g AS (SELECT digit, count(*) AS n FROM c GROUP BY digit),
         |t AS (SELECT sum(n) AS n_total FROM g)
         |SELECT digit, CAST(n AS BIGINT) AS n,
         | ${OracleSql.ppmSql("n", "n_total")} AS share_ppm,
         | CAST($expected AS BIGINT) AS benford_ppm,
         | ${OracleSql.ppmSql("n", "n_total")} - ($expected) AS dev_ppm
         |FROM g CROSS JOIN t ORDER BY digit""".stripMargin
    },
    "q158_l_diversity" ->
      s"""WITH j AS (
         | SELECT o_orderstatus, o_orderpriority,
         |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |  c_nationkey
         | FROM orders JOIN customer ON c_custkey = o_custkey),
         |g AS (
         | SELECT o_orderstatus, o_orderpriority, month,
         |  count(*) AS n, count(DISTINCT c_nationkey) AS l_distinct
         | FROM j GROUP BY 1, 2, 3)
         |SELECT o_orderstatus, o_orderpriority, month,
         | CAST(n AS BIGINT) AS n, CAST(l_distinct AS BIGINT) AS l_distinct
         |FROM g WHERE l_distinct < $LDiv
         |ORDER BY o_orderstatus, o_orderpriority, month""".stripMargin,
    "q62_data_profile" -> {
      // render OUTSIDE min/max, mirroring the Spark side: the bounds
      // aggregate native values, the string rendering applies to the
      // one-row result
      val renderSql = Map(
        "o_orderkey" -> ((e: String) => s"CAST($e AS VARCHAR)"),
        "o_custkey" -> ((e: String) => s"CAST($e AS VARCHAR)"),
        "o_orderstatus" -> ((e: String) => e),
        "o_totalprice" ->
          ((e: String) => s"CAST(CAST(round($e * 100) AS BIGINT) AS VARCHAR)"),
        "o_orderdate" -> ((e: String) => s"CAST($e AS VARCHAR)"),
        "o_orderpriority" -> ((e: String) => e))
      profiled.map { case (name, _, _) =>
        val r = renderSql(name)
        s"""SELECT '$name' AS col_name, count(*) AS n_rows,
           | count(*) - count($name) AS n_nulls,
           | count(DISTINCT $name) AS n_distinct,
           | ${r(s"min($name)")} AS min_repr,
           | ${r(s"max($name)")} AS max_repr
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"
    },
    "q63_constraints" ->
      s"""SELECT rule, n_violations FROM (
         | SELECT 'quantity_range' AS rule,
         |  CAST(sum(CAST(NOT (l_quantity >= $QuantityMin AND l_quantity <= $QuantityMax)
         |       OR l_quantity IS NULL AS BIGINT)) AS BIGINT) AS n_violations
         | FROM lineitem
         | UNION ALL
         | SELECT 'discount_range',
         |  CAST(sum(CAST(NOT (l_discount >= 0.0 AND l_discount <= $DiscountMax)
         |       OR l_discount IS NULL AS BIGINT)) AS BIGINT)
         | FROM lineitem
         | UNION ALL
         | SELECT 'price_positive',
         |  CAST(sum(CAST(NOT (l_extendedprice > 0.0)
         |       OR l_extendedprice IS NULL AS BIGINT)) AS BIGINT)
         | FROM lineitem
         | UNION ALL
         | SELECT 'orderkey_exists',
         |  (SELECT count(*) FROM lineitem l
         |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
         |ORDER BY rule""".stripMargin,
    "q78_iqr_outliers" ->
      """WITH e AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |r AS (
        | SELECT event_type, cents,
        |  row_number() OVER (PARTITION BY event_type ORDER BY cents) AS r,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM e),
        |q AS (
        | SELECT event_type, n,
        |  max(CASE WHEN r = (n + 3) // 4 THEN cents END) AS q1_cents,
        |  max(CASE WHEN r = (3 * n + 3) // 4 THEN cents END) AS q3_cents
        | FROM r GROUP BY 1, 2)
        |SELECT e.event_type, q.n, q.q1_cents, q.q3_cents,
        | q.q3_cents - q.q1_cents AS iqr_cents,
        | CAST(sum(CAST(e.cents <
        |   q.q1_cents - (3 * (q.q3_cents - q.q1_cents)) // 2
        |   AS BIGINT)) AS BIGINT) AS n_low,
        | CAST(sum(CAST(e.cents >
        |   q.q3_cents + (3 * (q.q3_cents - q.q1_cents)) // 2
        |   AS BIGINT)) AS BIGINT) AS n_high
        |FROM e JOIN q USING (event_type)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY e.event_type""".stripMargin,
    "q90_rolling_wavg" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |l AS (
        | SELECT user_id, event_id, us, cents,
        |  lag(cents, 1) OVER w AS c1,
        |  lag(cents, 2) OVER w AS c2,
        |  lag(cents, 3) OVER w AS c3
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, event_id, us, cents,
        | CAST(((coalesce(cents * 8, 0) + coalesce(c1 * 4, 0)
        |        + coalesce(c2 * 2, 0) + coalesce(c3, 0)) * 1000)
        |  // (CASE WHEN cents IS NULL THEN 0 ELSE 8 END
        |       + CASE WHEN c1 IS NULL THEN 0 ELSE 4 END
        |       + CASE WHEN c2 IS NULL THEN 0 ELSE 2 END
        |       + CASE WHEN c3 IS NULL THEN 0 ELSE 1 END)
        |  AS BIGINT) AS wavg_milli
        |FROM l ORDER BY user_id, us, event_id""".stripMargin,
    "q117_winsorized_mean" ->
      """WITH e AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |r AS (
        | SELECT event_type, cents,
        |  row_number() OVER (PARTITION BY event_type ORDER BY cents) AS r,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM e),
        |b AS (
        | SELECT event_type, n,
        |  max(CASE WHEN r = (n + 19) // 20 THEN cents END) AS lo_cents,
        |  max(CASE WHEN r = (19 * n + 19) // 20 THEN cents END) AS hi_cents
        | FROM r GROUP BY 1, 2)
        |SELECT e.event_type, b.n, b.lo_cents, b.hi_cents,
        | CAST(sum(CAST(e.cents < b.lo_cents AS BIGINT)) AS BIGINT) AS n_clipped_low,
        | CAST(sum(CAST(e.cents > b.hi_cents AS BIGINT)) AS BIGINT) AS n_clipped_high,
        | CAST(sum(greatest(least(e.cents, b.hi_cents), b.lo_cents)) AS BIGINT) AS win_sum_cents,
        | CAST(sum(greatest(least(e.cents, b.hi_cents), b.lo_cents)) * 1000 // b.n AS BIGINT) AS win_mean_milli
        |FROM e JOIN b USING (event_type)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY e.event_type""".stripMargin,
    "q124_mad_outliers" ->
      """WITH e AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |m1 AS (
        | SELECT event_type,
        |  max(CASE WHEN r = (n + 1) // 2 THEN cents END) AS med_cents
        | FROM (SELECT event_type, cents,
        |   row_number() OVER (PARTITION BY event_type ORDER BY cents) AS r,
        |   count(*) OVER (PARTITION BY event_type) AS n FROM e)
        | GROUP BY event_type),
        |d AS (
        | SELECT e.event_type, abs(e.cents - m1.med_cents) AS ad, m1.med_cents
        | FROM e JOIN m1 USING (event_type)),
        |m2 AS (
        | SELECT event_type,
        |  max(CASE WHEN r = (n + 1) // 2 THEN ad END) AS mad_cents
        | FROM (SELECT event_type, ad,
        |   row_number() OVER (PARTITION BY event_type ORDER BY ad) AS r,
        |   count(*) OVER (PARTITION BY event_type) AS n FROM d)
        | GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n, d.med_cents, m2.mad_cents,
        | CAST(sum(CAST(d.ad > m2.mad_cents * 3 AS BIGINT)) AS BIGINT) AS n_outliers,
        | CAST(max(d.ad) AS BIGINT) AS max_ad
        |FROM d JOIN m2 USING (event_type)
        |GROUP BY 1, 3, 4
        |ORDER BY d.event_type""".stripMargin,
    "q128_k_anonymity" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         | CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         | count(*) AS n
         |FROM orders
         |GROUP BY 1, 2, 3
         |HAVING count(*) < $KAnon
         |ORDER BY o_orderstatus, o_orderpriority, month""".stripMargin,
    "q129_totals_reconcile" ->
      """WITH d AS (
        | SELECT l_orderkey,
        |  CAST(sum(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)) AS BIGINT)
        |   AS charge_e6
        | FROM lineitem GROUP BY 1),
        |j AS (
        | SELECT o.o_orderstatus,
        |  abs(CAST(round(o.o_totalprice * 100) AS BIGINT) - d.charge_e6 // 10000)
        |   AS diff_cents,
        |  d.charge_e6
        | FROM orders o LEFT JOIN d ON o.o_orderkey = d.l_orderkey)
        |SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(charge_e6 IS NULL AS BIGINT)) AS BIGINT) AS n_no_items,
        | CAST(sum(CAST(diff_cents >= 2 AS BIGINT)) AS BIGINT) AS n_mismatch,
        | CAST(max(diff_cents) AS BIGINT) AS max_diff_cents
        |FROM j GROUP BY 1 ORDER BY o_orderstatus""".stripMargin
  )
}
