package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{BloomAgg, CountMinAgg, DotProductLong, GraftBridge, HyperplaneBuckets, Md5PrefixLong, SimHash60, SortedIntersectCount, SortedIntersectCountLong, SortedPackedDotLong}

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

  /** Sparse weighted dot product of two ascending-sorted packed
    * arrays (`(key << 32) | weight` per element, weights unsigned
    * 32-bit) — the sorted-merge kernel for weighted similarity joins
    * (q176's TF-IDF cosine verify). */
  def sortedPackedDotLong(a: Column, b: Column): Column =
    GraftBridge.column(SortedPackedDotLong(
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

  /** Bloom-filter aggregate over a non-negative BIGINT key: a
    * `words×64`-bit set as `array<bigint>`, mergeable by word-wise OR
    * (partial aggregation applies), hash family shared with
    * [[bloomMightContain]]. */
  def bloomFilterAgg(key: Column, words: Int, k: Int): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(key), words, k)
        .toAggregateExpression())

  /** Membership probe against a [[bloomFilterAgg]] bitset — built from
    * codegen'd built-ins only (multiply-mod positions, word index via
    * exact floor-division, bit test), so the probe inlines into
    * whole-stage codegen on the FACT side of a join with no custom
    * expression in the hot path. False positives possible, false
    * negatives impossible (same hash constants as the aggregate). */
  def bloomMightContain(bits: Column, key: Column, words: Int, k: Int): Column = {
    val mBits = words.toLong * 64L
    (0 until k).map { j =>
      // key folded mod P first — mirrors BloomAgg.bitPos exactly, so
      // the probe agrees with the aggregate for ALL non-negative longs
      // (the unfolded product overflows above 2³⁹).
      val pos = (lit(CountMinAgg.A(j)) * (key % lit(CountMinAgg.P)) +
        lit(CountMinAgg.B(j))) % lit(CountMinAgg.P) % lit(mBits)
      // pos < 2^31: floor(pos/64) is exact in double; bit test via
      // shiftleft(1L, pos mod 64) — both codegen'd built-ins
      val word = element_at(bits, floor(pos / lit(64L)).cast("int") + lit(1))
      (word.bitwiseAND(call_function("shiftleft", lit(1L),
        (pos % lit(64L)).cast("int")))) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Per-table random-hyperplane LSH bucket ids for a quantized vector
    * (`array<long>`), planes baked in as codegen constants. */
  def hyperplaneBuckets(q: Column, planes: Array[Long], tables: Int,
      planesPerTable: Int, dim: Int): Column =
    GraftBridge.column(HyperplaneBuckets(GraftBridge.expression(q),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(planes),
      tables, planesPerTable, dim))
}
