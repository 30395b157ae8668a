package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Sparse-vector dot product over two ASCENDING-sorted packed arrays:
  * each element encodes `(key << 32) | weight` with a 32-bit key in
  * the high half and an unsigned 32-bit weight in the low half, so a
  * sparse weighted vector rides the same allocation-free sorted-merge
  * loop as [[SortedIntersectCountLong]] — one array column, one
  * `BinaryExpression`, full whole-stage codegen — instead of four
  * parallel key/value arrays. On a key match the unpacked weights
  * multiply into the accumulator; mismatches advance the lagging side.
  *
  * Inputs MUST have duplicate-free keys and be sorted ascending (the
  * packed longs sort by key because the weight sits in the low bits);
  * weights must fit 32 bits unsigned. Not checked. The accumulator is
  * exact while Σ wa·wb < 2^63 — the caller bounds the weights (q176
  * caps them at 1e6, giving ~9·10⁶ shared keys of headroom).
  */
case class SortedPackedDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xn, yn) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var acc = 0L
    while (i < xn && j < yn) {
      if (x.isNullAt(i) || y.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_packed_dot_long: null element")
      val xi = x.getLong(i); val yj = y.getLong(j)
      // ARITHMETIC shift: a 32-bit key lands in the sign half for
      // key ≥ 2^31, so the packed longs sort by SIGNED key — the
      // merge must compare in the same order the array was sorted in
      val kx = xi >> 32; val ky = yj >> 32
      if (kx == ky) {
        acc += (xi & 0xFFFFFFFFL) * (yj & 0xFFFFFFFFL); i += 1; j += 1
      } else if (kx < ky) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val kx = ctx.freshName("kx"); val ky = ctx.freshName("ky")
      s"""
         |int $i = 0, $j = 0;
         |final int $an = $a.numElements(), $bn = $b.numElements();
         |long ${ev.value}Acc = 0L;
         |while ($i < $an && $j < $bn) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "sorted_packed_dot_long: null element");
         |  }
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  final long $kx = $xv >> 32; // arithmetic: match signed sort
         |  final long $ky = $yv >> 32;
         |  if ($kx == $ky) {
         |    ${ev.value}Acc += ($xv & 0xFFFFFFFFL) * ($yv & 0xFFFFFFFFL);
         |    $i++; $j++;
         |  }
         |  else if ($kx < $ky) $i++;
         |  else $j++;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedPackedDotLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_packed_dot_long"
}
