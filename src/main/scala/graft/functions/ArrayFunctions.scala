package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{CountMinAgg, DotProductLong, GraftBridge, HyperplaneBuckets, Md5PrefixLong, SimHash60, SortedIntersectCount, SortedIntersectCountLong}

/** Public Column API over graft's native Catalyst expressions.
  *
  * The expression classes themselves live in the
  * `org.apache.spark.sql.graftbridge` package because Catalyst's
  * expression SPI (`AbstractDataType`, codegen contexts) is
  * `private[sql]`; this object is the supported entry point.
  */
object ArrayFunctions {

  /** `|A ∩ B|` of two ascending-sorted, duplicate-free `array<int>`
    * columns via a codegen'd linear merge — no per-row hash sets.
    * Union size follows as `size(a) + size(b) - sortedIntersectCount`. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** [[sortedIntersectCount]] over `array<bigint>` — for 64-bit id
    * spaces (graph adjacency at 100 TB key widths). */
  def sortedIntersectCountLong(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCountLong(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** 60-bit SimHash of pre-hashed words (`array<long>`) — one pass,
    * one scratch array per row (the HOF fold allocates per word). */
  def simhash60(hashes: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(hashes)))

  /** First 8 or 15 hex digits of md5 as unsigned BIGINT — equal to
    * `conv(substring(md5(x), 1, n), 16, 10)` without the hex-string /
    * substring / radix-parse allocations per evaluation. */
  def md5Prefix(s: Column, hexDigits: Int): Column =
    GraftBridge.column(Md5PrefixLong(GraftBridge.expression(s), hexDigits))

  /** Exact integer dot product of two `array<long>` columns — one
    * fused codegen'd loop (the zip_with/aggregate form allocates the
    * zipped array per row). */
  def dotProductLong(a: Column, b: Column): Column =
    GraftBridge.column(DotProductLong(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Count-min sketch aggregate over a non-negative BIGINT key: one
    * `depth × width` counter grid per group, flattened row-major to
    * `array<bigint>` — constant-size, mergeable (partial aggregation
    * applies), deterministic (integer multiply-mod hash family). */
  def countMinSketch(key: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(key), depth, width)
        .toAggregateExpression())

  /** Per-table random-hyperplane LSH bucket ids for a quantized vector
    * (`array<long>`), planes baked in as codegen constants. */
  def hyperplaneBuckets(q: Column, planes: Array[Long], tables: Int,
      planesPerTable: Int, dim: Int): Column =
    GraftBridge.column(HyperplaneBuckets(GraftBridge.expression(q),
      planes, tables, planesPerTable, dim))
}
