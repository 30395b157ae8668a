package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Random-hyperplane LSH bucket ids for a quantized vector: for each of
  * `tables` hash tables, the sign bits of `planesPerTable` integer
  * hyperplane dot products packed into one bucket id. Returns
  * `array<int>` of length `tables` (index = table id).
  *
  * `planes` is the flattened constant matrix
  * `[table][plane][dim] → planes(((t*planesPerTable)+p)*dim + j)`,
  * baked in as a codegen reference object — the higher-order-function
  * form re-allocates a zipped array per plane per row (36× per row at
  * the q35 defaults). One pass; per-row allocation is the result plus
  * one scratch vector copy (the SimHash60 pattern), which buys back
  * tables·planesPerTable−1 of every component's null-check +
  * virtual-read pair.
  */
case class HyperplaneBuckets(
    child: Expression,
    planes: Seq[Long], // Seq, not Array: structural equality keeps
    // semanticEquals / exchange reuse / CSE working on this expression
    tables: Int,
    planesPerTable: Int,
    dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(tables > 0 && dim > 0, s"need tables > 0, dim > 0")
  // 1 << p is a 32-bit shift: p ≥ 32 would wrap and silently alias
  // sign bits onto already-used bucket bits (recall loss, no error);
  // 31 also keeps the bucket id inside a positive Int
  require(planesPerTable >= 1 && planesPerTable <= 31,
    s"planesPerTable must be in [1, 31], got $planesPerTable")
  require(planes.length == tables * planesPerTable * dim,
    s"planes length ${planes.length} != $tables*$planesPerTable*$dim")

  private lazy val planesArr: Array[Long] = planes.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    // One pre-pass copies the vector into a local scratch array (the
    // SimHash60 pattern): the t×p plane loops otherwise repeat the
    // isNullAt + virtual getLong pair tables·planesPerTable times per
    // component (36× at the q35 defaults). Null semantics unchanged —
    // the pre-pass scans in index order, so the first null component
    // still throws first.
    val vec = new Array[Long](n)
    var j0 = 0
    while (j0 < n) {
      if (v.isNullAt(j0))
        throw new IllegalArgumentException(
          "hyperplane_buckets: null vector component")
      vec(j0) = v.getLong(j0)
      j0 += 1
    }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planesPerTable) {
        val base = ((t * planesPerTable) + p) * dim
        var dot = 0L
        var j = 0
        while (j < n) {
          dot += vec(j) * planesArr(base + j)
          j += 1
        }
        if (dot >= 0L) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesArr, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val p = ctx.freshName("p")
      val j = ctx.freshName("j"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket"); val base = ctx.freshName("base")
      val vec = ctx.freshName("vec")
      // same scratch-vector pre-pass as nullSafeEval: one null check +
      // one getLong per component instead of tables·planesPerTable
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $dim);
         |final long[] $vec = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "hyperplane_buckets: null vector component");
         |  }
         |  $vec[$j] = $a.getLong($j);
         |}
         |final int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $planesPerTable; $p++) {
         |    final int $base = (($t * $planesPerTable) + $p) * $dim;
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $dot += $vec[$j] * $planesRef[$base + $j];
         |    }
         |    if ($dot >= 0L) $bucket |= (1 << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_buckets"
}
