package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** One-pass integer Gram census over a fixed-width `array<bigint>`
  * vector column: the exact moment set a covariance build needs —
  * per-pair products Σ vᵢ·vⱼ (upper triangle, the matrix is
  * symmetric), per-dim sums Σ vᵢ, and the row count — accumulated in
  * ONE fixed-size mergeable buffer.
  *
  * This is the per-partition outer-product partial that replaces the
  * nested-posexplode census (reference shape: N·D² generated rows
  * through a D²-group hash aggregate). The aggregate does the same
  * arithmetic as D(D+1)/2 multiply-adds per input row inside one JVM
  * loop, and each executor ships a single
  * `(D(D+1)/2 + D + 1)·8`-byte buffer regardless of input size —
  * at 100 TB the shuffle is D²-bytes-per-partition, not N·D² rows.
  *
  * Buffer layout (row-major upper triangle, then sums, then count):
  * {{{
  *   [0, T)        gram(i,j), i ≤ j, at i·D − i(i−1)/2 + (j−i)
  *   [T, T+D)      per-dim sums
  *   T+D           row count            where T = D(D+1)/2
  * }}}
  *
  * Exactness and overflow: all cells are exact 64-bit integer sums.
  * |gram(i,j)| ≤ n·max(v)² — for QScale-milli quantized embeddings
  * (|v| ≤ ~600, Similarity.QScale) capacity is ~2.6e13 rows, two
  * orders past 100 TB of 64-dim vectors. Every accumulate is
  * `Math.addExact`/`multiplyExact` (JIT-intrinsified add+jo — free
  * after warmup), so an overflowing corpus fails the task loudly with
  * ArithmeticException instead of wrapping silently.
  *
  * Strictness: a null vector row is skipped (matches posexplode
  * emitting nothing); a ragged row (length ≠ dim) or a null element
  * throws with the offending width — the census is only meaningful
  * over a fixed-dimension table, and a silent skip would change n for
  * some cells but not others.
  */
case class GramCensusAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(dim > 0 && dim <= 1024, s"unsupported gram dimension $dim")

  private val tri = dim * (dim + 1) / 2

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](tri + dim + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim) throw new IllegalArgumentException(
        s"gram_census(dim=$dim) got a vector of width ${arr.numElements()}")
      var i = 0
      var base = 0 // start of row i's triangle slice
      while (i < dim) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"gram_census(dim=$dim) got a null component at index $i")
        val vi = arr.getLong(i)
        buf(tri + i) = Math.addExact(buf(tri + i), vi)
        var j = i
        while (j < dim) {
          buf(base + (j - i)) = Math.addExact(buf(base + (j - i)),
            Math.multiplyExact(vi, arr.getLong(j)))
          j += 1
        }
        base += dim - i
        i += 1
      }
      buf(tri + dim) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMinAgg.serLongs(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMinAgg.deLongs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramCensusAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramCensusAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramCensusAgg =
    copy(child = newChild)

  override def prettyName: String = "gram_census"
}
