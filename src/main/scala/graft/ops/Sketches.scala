package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-sketch aggregations — the sub-linear-memory summaries a
  * 100 TB warehouse leans on when exact distinct/quantiles are too
  * expensive: HyperLogLog++ distinct counts and Greenwald-Khanna
  * quantiles, via Spark's builtin sketch aggregates (partial-merge
  * form, so map-side combine applies and executor memory stays
  * O(sketch), never O(distinct values)).
  *
  * No DuckDB oracle: both engines implement DIFFERENT sketch
  * algorithms, so cross-engine hash parity is impossible by
  * construction — the driver records the rows-only check, and
  * `SketchesSpec` pins the error bounds against exact computations
  * (HLL++ at rsd=0.02 must sit within ±5 %; the quantile sketch within
  * the documented rank tolerance). Each query also carries the exact
  * value next to the estimate so the bound is auditable in the output
  * itself.
  */
object Sketches {

  /** q39: per-nation distinct customers — HLL++ estimate beside the
    * exact count (the exact side is what a user replaces at scale). */
  def sketchDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(
        approx_count_distinct(col("c_custkey"), rsd = 0.02).as("approx_customers"),
        countDistinct(col("c_custkey")).as("exact_customers"))
      .orderBy("nationkey")

  /** q40: order-price quantiles per status — GK sketch at accuracy
    * 10000 beside the exact interpolated percentile. Output is four
    * scalar DOUBLE columns (not arrays): the driver's rows-only check
    * sorts the parquet in pandas, and array cells are unhashable there. */
  def quantileSketch(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), array(lit(0.5), lit(0.95)),
          lit(10000)).as("ap"),
        expr("percentile(o_totalprice, array(0.5, 0.95))").as("ep"),
        count(lit(1)).as("n_orders"))
      .select(
        col("orderstatus"),
        col("ap").getItem(0).as("approx_p50"),
        col("ap").getItem(1).as("approx_p95"),
        col("ep").getItem(0).as("exact_p50"),
        col("ep").getItem(1).as("exact_p95"),
        col("n_orders"))
      .orderBy("orderstatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_sketch_distinct" -> (sketchDistinct _),
    "q40_quantile_sketch" -> (quantileSketch _)
  )

  /** Intentionally empty: sketch algorithms are engine-specific; the
    * driver's rows-only check applies (see class doc). */
  val oracles: Map[String, String] = Map.empty
}
