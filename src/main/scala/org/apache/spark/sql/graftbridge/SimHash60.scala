package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** 60-bit SimHash of a pre-hashed word array (`array<long>`, values <
  * 2^60): per bit position, majority vote of ±1 over the words' bits;
  * vote > 0 sets the bit.
  *
  * Why native: the higher-order-function formulation
  * (`aggregate(hs, array_repeat(0L, 60), (acc, h) -> zip_with(...))`)
  * allocates a fresh 60-element array PER WORD per row — measured ~3 s
  * for 5k docs at sf0.1. This kernel is one pass with a single 60-slot
  * scratch array per row, whole-stage-codegen'd.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  private val Bits = 60

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](Bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException("simhash60: null hash element")
      val h = arr.getLong(i)
      var p = 0
      while (p < Bits) {
        votes(p) += (if (((h >> p) & 1L) == 1L) 1L else -1L)
        p += 1
      }
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < Bits) {
      if (votes(p) > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final long[] $votes = new long[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException("simhash60: null hash element");
         |  }
         |  final long $h = $a.getLong($i);
         |  for (int $p = 0; $p < $Bits; $p++) {
         |    $votes[$p] += ((($h >> $p) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $p = 0; $p < $Bits; $p++) {
         |  if ($votes[$p] > 0) $out |= (1L << $p);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}
