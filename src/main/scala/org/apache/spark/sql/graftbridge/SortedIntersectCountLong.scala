package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** `|A ∩ B|` for two ASCENDING-sorted `array<bigint>` set columns —
  * [[SortedIntersectCount]] for 64-bit ids. The dedup family's shingle
  * hashes fit 32 bits by construction; graph node ids (q68's adjacency
  * intersections) are BIGINT keys that exceed Int range at the 100 TB
  * design point, so they get the same linear, allocation-free,
  * whole-stage-codegen merge at their real width rather than a lossy
  * cast.
  *
  * Inputs MUST be duplicate-free and sorted ascending; not checked.
  */
case class SortedIntersectCountLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xn, yn) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < xn && j < yn) {
      if (x.isNullAt(i) || y.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_intersect_count_long: null set element")
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0;
         |final int $an = $a.numElements(), $bn = $b.numElements();
         |long ${ev.value}Acc = 0L;
         |while ($i < $an && $j < $bn) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count_long: null set element");
         |  }
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}Acc++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count_long"
}
