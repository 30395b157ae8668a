package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{GraftBridge, SortedIntersectCount}

/** Public Column API over graft's native Catalyst expressions.
  *
  * The expression classes themselves live in the
  * `org.apache.spark.sql.graftbridge` package because Catalyst's
  * expression SPI (`AbstractDataType`, codegen contexts) is
  * `private[sql]`; this object is the supported entry point.
  */
object ArrayFunctions {

  /** `|A ∩ B|` of two ascending-sorted, duplicate-free `array<int>`
    * columns via a codegen'd linear merge — no per-row hash sets.
    * Union size follows as `size(a) + size(b) - sortedIntersectCount`. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
