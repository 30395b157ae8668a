package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** `|A ∩ B|` for two ASCENDING-sorted `array<int>` set columns, as one
  * linear merge — the hot verify kernel of the dedup family.
  *
  * Why not `size(array_intersect(a, b))`: that builds a fresh hash set
  * per row; on hundreds of thousands of candidate pairs × ~300-element
  * sets the allocation + hashing dominates the whole query (measured
  * ~75 s of a 91 s run at sf0.1). The merge is branch-cheap, allocates
  * nothing, and whole-stage-codegens inline, so verify runs at memory
  * bandwidth even when AQE coalesces the small-byte join output onto
  * few partitions. Union size then falls out for free as
  * `|A| + |B| − |A ∩ B|`.
  *
  * Inputs MUST be duplicate-free and sorted ascending
  * (`sort_array(array_distinct(...))`); this is not checked. Null
  * ELEMENTS are rejected loudly: a null slot read as 0 would silently
  * match a genuine 0 on the other side and inflate the count — wrong
  * Jaccard verdicts with no error.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xn, yn) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < xn && j < yn) {
      if (x.isNullAt(i) || y.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_intersect_count: null set element")
      val xi = x.getInt(i); val yj = y.getInt(j)
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
         |      "sorted_intersect_count: null set element");
         |  }
         |  final int $xv = $a.getInt($i);
         |  final int $yv = $b.getInt($j);
         |  if ($xv == $yv) { ${ev.value}Acc++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}
