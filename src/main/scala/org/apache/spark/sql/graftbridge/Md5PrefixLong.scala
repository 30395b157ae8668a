package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First `hexDigits` hex digits of md5(input) as an unsigned BIGINT —
  * numerically identical to `conv(substring(md5(x), 1, hexDigits),
  * 16, 10)` (the cross-engine hash contract shared with the DuckDB
  * oracle) but computed straight from the digest bytes: no 32-char hex
  * string, no substring copy, no radix re-parse. These three
  * allocations sit on EVERY shingle/word/gram of the dedup and
  * fingerprint family — millions of evaluations per query.
  *
  * Supported widths: 8 (32-bit hash) and 15 (60 bits — the widest
  * prefix that fits a signed long).
  */
case class Md5PrefixLong(child: Expression, hexDigits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(hexDigits == 8 || hexDigits == 15,
    s"unsupported md5 prefix width $hexDigits")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5PrefixLong.prefix(
      input.asInstanceOf[UTF8String].getBytes, hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.Md5PrefixLong.prefix(" +
        s"$a.getBytes(), $hexDigits);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix_long"
}

object Md5PrefixLong {
  /** One digest instance per task thread — `getInstance` does a JCA
    * provider lookup and allocates per call, a real cost at millions
    * of evaluations per query; `digest()` leaves the instance reset,
    * so reuse across rows is sound. */
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First-4-bytes (8 hex digits) or first-60-bits (15 hex digits)
    * unsigned value of md5(bytes). */
  def prefix(bytes: Array[Byte], hexDigits: Int): Long = {
    val d = md.get().digest(bytes)
    if (hexDigits == 8)
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    else {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v >>> 4
    }
  }
}
