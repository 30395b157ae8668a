package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Bloom-filter aggregate over a non-negative BIGINT key column: a
  * `words × 64`-bit set where key x sets bit h_j(x) for each of k hash
  * functions. Membership is "maybe" (possible false positives), never
  * a false negative — so a bloom PRE-filter composed with an exact
  * join downstream is lossless, and that is exactly how
  * [[graft.ops.Pruning]] uses it.
  *
  * Same `TypedImperativeAggregate` shape as [[CountMinAgg]]: update
  * sets k bits, merge is word-wise OR, so partial aggregation applies
  * and each executor ships one fixed `words·8`-byte buffer. The hash
  * family is the shared multiply-mod family (`CountMinAgg.A/B/P`) over
  * the key folded mod P — exact in signed 64-bit for every
  * non-negative long key and therefore reproducible by any engine from
  * the same constants — the filter's bit pattern is a deterministic
  * function of the key SET, not of execution order.
  */
case class BloomAgg(
    child: Expression,
    words: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(words > 0 && words <= (1 << 24) && Integer.bitCount(words) == 1,
    s"bloom words must be a power of two ≤ 2^24, got $words")
  require(k > 0 && k <= CountMinAgg.A.length, s"unsupported k=$k")

  private val mBits: Long = words.toLong * 64L

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      CountMinAgg.requireNonNegative(x, "bloom_agg")
      var j = 0
      while (j < k) {
        val pos = BloomAgg.bitPos(j, x, mBits)
        buf((pos >>> 6).toInt) |= (1L << (pos & 63L))
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMinAgg.serLongs(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMinAgg.deLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)

  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  /** Bit position of hash j for key x — shared with the membership
    * test in [[graft.functions.ArrayFunctions.bloomMightContain]].
    * Key folded mod P first (same widening as [[CountMinAgg.bucket]]):
    * exact for every non-negative long, no 2³⁹ ceiling. */
  def bitPos(j: Int, x: Long, mBits: Long): Long =
    ((CountMinAgg.A(j) * (x % CountMinAgg.P) + CountMinAgg.B(j)) %
      CountMinAgg.P) % mBits
}
