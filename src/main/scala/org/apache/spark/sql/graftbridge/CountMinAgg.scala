package org.apache.spark.sql.graftbridge

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Count-min sketch over a non-negative BIGINT key column — the
  * sub-linear heavy-hitters summary (Cormode & Muthukrishnan 2005):
  * a `depth × width` counter grid where row j counts key x at column
  * h_j(x); the point estimate for x is min_j grid[j][h_j(x)], which is
  * ≥ the true count always and ≤ true + (e/width)·N with probability
  * 1 − e^−depth.
  *
  * Implemented as a `TypedImperativeAggregate[Array[Long]]`: update
  * adds 1 at `depth` positions, merge is element-wise vector addition —
  * so partial aggregation applies and each executor ships one fixed
  * `depth·width·8`-byte buffer regardless of input size. That mergeable
  * one-pass shape is the entire point at 100 TB: the frequency table a
  * `groupBy(key).count()` would shuffle is replaced by a constant-size
  * sketch that never shuffles rows at all.
  *
  * Determinism (the DuckDB oracle recomputes the SAME grid from exact
  * group counts): the hash family is the integer multiply-mod
  * h_j(x) = ((A_j·(x mod P) + B_j) mod P) mod width with P = 2³¹ − 1
  * and A_j < 2²⁴ — the key is folded mod P before the multiply, so
  * every product stays exact in signed 64-bit for ALL non-negative
  * long keys (no upper bound; negative keys fail loudly in update),
  * counter sums are order-independent, and min over rows is exact.
  * No md5 in the hot path: four multiply-mods per input row.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(depth > 0 && depth <= CountMinAgg.A.length &&
    width > 0 && width <= (1 << 20),
    s"unsupported count-min geometry ${depth}x$width")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      CountMinAgg.requireNonNegative(x, "count_min_agg")
      var j = 0
      while (j < depth) {
        buf(j * width + CountMinAgg.bucket(j, x, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMinAgg.serLongs(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMinAgg.deLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)

  override def prettyName: String = "count_min_agg"
}

object CountMinAgg {
  /** Mersenne modulus: mod is cheap and the family is 2-universal. */
  val P = 2147483647L
  /** Row hash constants — primes < 2²⁴ (see overflow bound above). */
  val A: Array[Long] = Array(1299721L, 7368787L, 9999991L, 15485863L)
  val B: Array[Long] = Array(104729L, 224737L, 350377L, 479909L)

  /** h_j(x) — shared by the aggregate, the estimate lookup, and (as
    * literal SQL) the DuckDB oracle. The key is folded `x mod P` FIRST
    * so the subsequent product is ≤ (2²⁴)·(2³¹) < 2⁵⁵ — exact in
    * signed 64-bit for EVERY non-negative long key, with no upper
    * bound (the old `x < 2³⁹` precondition silently overflowed on
    * larger keys; TPC-H orderkeys exceed it near SF100k). Keys < P
    * hash identically to the unfolded form, so small-SF oracles are
    * unchanged. Negative keys are rejected loudly by the aggregates. */
  def bucket(j: Int, x: Long, width: Int): Int =
    (((A(j) * (x % P) + B(j)) % P) % width).toInt

  /** Loud guard shared by [[CountMinAgg]]/[[BloomAgg]] update paths:
    * a negative key would produce a negative Java `%` remainder and a
    * negative bit/bucket index — fail the task rather than corrupt the
    * sketch (one predictable branch per row, free after JIT). */
  def requireNonNegative(x: Long, who: String): Unit =
    if (x < 0L) throw new IllegalArgumentException(
      s"$who requires a non-negative key, got $x")

  /** Long-array agg-buffer serde shared by [[CountMinAgg]] and
    * [[BloomAgg]] — one definition to keep in sync. */
  def serLongs(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  def deLongs(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}
