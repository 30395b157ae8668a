package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{BloomAgg, CountMinAgg, DotProductLong, GraftBridge, GramCensusAgg, HyperplaneBuckets, Md5PrefixLong, SimHash60, SortedIntersectCount, SortedIntersectCountLong, SortedPackedDotLong}

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

  /** Integer Gram census aggregate over a fixed-width `array<bigint>`
    * vector column: one `D(D+1)/2 + D + 1`-long buffer holding the
    * upper-triangle pair products Σvᵢvⱼ, per-dim sums Σvᵢ, and the row
    * count — the per-partition outer-product partial that replaces an
    * N·D² nested-posexplode census (q182's covariance build). Fixed
    * size, mergeable, exact 64-bit with loud overflow. */
  def gramCensus(q: Column, dim: Int): Column =
    GraftBridge.column(
      GramCensusAgg(GraftBridge.expression(q), dim)
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
    // Mirror BloomAgg's constructor invariants at Column-build time:
    // a probe with parameters the aggregate would have rejected (or
    // with different words/k than the filter was BUILT with) changes
    // bit positions and silently drops matching rows via false
    // negatives — the one failure a bloom pre-filter must never have.
    require(words > 0 && words <= (1 << 24) && (words & (words - 1)) == 0,
      s"words must be a positive power of two ≤ 2^24, got $words")
    require(k > 0 && k <= CountMinAgg.A.length,
      s"k must be in 1..${CountMinAgg.A.length}, got $k")
    val mBits = words.toLong * 64L
    val probes = (0 until k).map { j =>
      // key folded mod P first — mirrors BloomAgg.bitPos exactly, so
      // the probe agrees with the aggregate for ALL non-negative longs
      // (the unfolded product overflows above 2³⁹).
      val pos = (lit(CountMinAgg.A(j)) * (key % lit(CountMinAgg.P)) +
        lit(CountMinAgg.B(j))) % lit(CountMinAgg.P) % lit(mBits)
      // word index and bit offset in pure integer arithmetic —
      // shiftright/bitwiseAND mirror the aggregate's `pos >>> 6` /
      // `& 63` directly (pos ≥ 0 here, so >> ≡ >>>), with no
      // double-precision exactness caveat to maintain
      val word = element_at(bits, shiftright(pos, 6).cast("int") + lit(1))
      (word.bitwiseAND(call_function("shiftleft", lit(1L),
        pos.bitwiseAND(lit(63L)).cast("int")))) =!= lit(0L)
    }.reduce(_ && _)
    // A NEGATIVE fact-side key cannot be in the filter (BloomAgg
    // rejects negatives loudly on the build side), so the correct
    // probe answer is false — without the guard, Java's signed % makes
    // every pos negative: element_at index 0 throws, and indices
    // ≤ −1 silently read a word from the END of the array (an
    // arbitrary true/false). Null keys propagate null, which the
    // pre-filter treats as non-matching — same as the exact join.
    when(key < 0L, lit(false)).otherwise(probes)
  }

  /** Per-table random-hyperplane LSH bucket ids for a quantized vector
    * (`array<long>`), planes baked in as codegen constants. */
  def hyperplaneBuckets(q: Column, planes: Array[Long], tables: Int,
      planesPerTable: Int, dim: Int): Column =
    // COPY the planes (toIndexedSeq), never unsafeWrapArray: the Seq
    // participates in the expression's semanticEquals/canonicalization
    // (CSE, exchange reuse), so aliasing the caller's mutable buffer
    // would let a later mutation silently change this expression's
    // semantics — or let two genuinely different plane sets compare
    // equal.
    GraftBridge.column(HyperplaneBuckets(GraftBridge.expression(q),
      planes.toIndexedSeq, tables, planesPerTable, dim))
}
