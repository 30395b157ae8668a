package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<long>` columns (length =
  * min of the two).
  *
  * The builtin formulation `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * allocates the zipped array and the lambda closures per ROW — on a
  * few hundred thousand candidate pairs that dominates the verify
  * stage of the ANN queries. This is one fused loop, codegen'd.
  * Callers guarantee quantized inputs bounded so the sum stays well
  * inside 64-bit (see Similarity's quantization notes).
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var acc = 0L
    while (i < n) {
      // a null component read as 0 would yield a concrete wrong score
      // where the builtin zip_with/aggregate form yields NULL — fail
      // loudly instead (callers guarantee quantized non-null vectors)
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          "dot_product_long: null vector component")
      acc += x.getLong(i) * y.getLong(i); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "dot_product_long: null vector component");
         |  }
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_long"
}
