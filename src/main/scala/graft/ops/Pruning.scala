package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ArrayFunctions
import graft.ops.Det._

/** Scan-reduction machinery: bloom-filter semi-join (q85) and Z-order
  * locality statistics (q86) — the two workhorse techniques for "touch
  * less data" at 100 TB, expressed as oracle-checkable queries.
  *
  * q85 — bloom semi-join. When the dimension side of a semi-join is
  * too large to broadcast as a hash relation but its KEY SET fits a
  * few megabits, the scalable plan is: aggregate the dim keys into a
  * bloom bitset (one fixed-size buffer per executor, merged by OR),
  * broadcast the single-row bitset, pre-filter the fact side with the
  * probe INSIDE the scan stage (whole-stage codegen, no custom
  * expression), and only then run the exact shuffle semi-join on the
  * survivors. False positives are removed by the exact join, so the
  * composition is LOSSLESS — which is why the oracle is the plain
  * semi-join — while the fact-side shuffle shrinks by the filter's
  * selectivity (~10× here). Spark's own runtime bloom
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) plans the same
  * shape adaptively; this operator is the explicit, tunable form.
  *
  * q86 — Z-order (Morton) locality. Interleaving the bits of two join/
  * filter dimensions gives a 1-D sort key whose prefix buckets are
  * axis-aligned boxes: sorting a 100 TB table by z before writing
  * makes BOTH `x BETWEEN` and `y BETWEEN` predicates prune row groups
  * (each bucket's min/max footer stats span ≤ 2^(16−p) per axis,
  * proved in `PruningSpec`). The query emits the per-bucket stats a
  * layout job would write as its skipping index; everything is integer
  * bit arithmetic, identical in both engines.
  */
object Pruning {

  // -------------------------------------------------------------- q85
  private[ops] val BloomWords = 4096 // 2^18 bits
  private[ops] val BloomK = 4
  private val PriceMin = 450000.0

  def bloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(s, dir)
      .filter(col("o_totalprice") >= PriceMin)
      .select(col("o_orderkey"))
    // Materialize the bitset at plan-build time and embed it as an
    // ARRAY LITERAL in the probe — the same scalar-subquery shape
    // Spark's runtime bloom filter uses (the driver holds words·8
    // bytes = 32 KB, never rows). The first formulation joined the
    // 1-row bitset in (crossJoin(broadcast(bloom)) + filter) and
    // Catalyst REORDERED that cross join above the exact semi-join,
    // probing after the join it exists to shrink; a literal keeps the
    // probe a plain Filter fused into the fact scan's codegen stage,
    // BELOW the semi-join's shuffle, where it pays off.
    val bits: Seq[Long] = dim.agg(
        ArrayFunctions.bloomFilterAgg(col("o_orderkey"), BloomWords, BloomK)
          .as("bits"))
      .collect()(0).getSeq[Long](0)
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_quantity"), cents(col("l_extendedprice")).as("price_cents"))
    val pre = fact.filter(ArrayFunctions.bloomMightContain(
      typedLit(bits), col("l_orderkey"), BloomWords, BloomK))
    pre.join(dim, pre("l_orderkey") === dim("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        lsum(col("l_quantity")).as("sum_qty"),
        lsum(col("price_cents")).as("sum_price_cents"))
      .orderBy("l_returnflag")
  }

  // -------------------------------------------------------------- q86
  /** 16 bits per axis; bucket = top `2·BucketBits` z-bits, so each
    * bucket is a 2^(16−BucketBits)-wide axis-aligned box. */
  private[ops] val AxisBits = 16
  private[ops] val BucketBits = 8
  private val AxisMask = (1L << AxisBits) - 1

  /** Morton interleave of two AxisBits-wide non-negative ints:
    * x occupies even bit positions, y odd. Built-ins only. */
  private[ops] def zValue(x: Column, y: Column): Column =
    (0 until AxisBits).map { i =>
      val xb = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))

  def zorderStats(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.lineitem(s, dir).select(
      col("l_partkey").bitwiseAND(lit(AxisMask)).as("zx"),
      col("l_suppkey").bitwiseAND(lit(AxisMask)).as("zy"))
    pts.withColumn("bucket",
        shiftright(zValue(col("zx"), col("zy")), 2 * (AxisBits - BucketBits)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("zx").as("min_x"), max("zx").as("max_x"),
        min("zy").as("min_y"), max("zy").as("max_y"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_bloom_semi_join" -> (bloomSemiJoin _),
    "q86_zorder_stats" -> (zorderStats _)
  )

  /** The z-interleave as DuckDB SQL, generated from the same loop. */
  private def zSql(x: String, y: String): String =
    (0 until AxisBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  val oracles: Map[String, String] = Map(
    "q85_bloom_semi_join" ->
      s"""SELECT l_returnflag, count(*) AS n_items,
         | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         | CAST(sum(round(l_extendedprice * 100)) AS BIGINT)
         |   AS sum_price_cents
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
         |  WHERE o_totalprice >= $PriceMin)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q86_zorder_stats" ->
      s"""WITH pts AS (
         | SELECT l_partkey & $AxisMask AS zx, l_suppkey & $AxisMask AS zy
         | FROM lineitem)
         |SELECT (${zSql("zx", "zy")}) >> ${2 * (AxisBits - BucketBits)}
         |   AS bucket,
         | count(*) AS n_rows,
         | min(zx) AS min_x, max(zx) AS max_x,
         | min(zy) AS min_y, max(zy) AS max_y
         |FROM pts GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
