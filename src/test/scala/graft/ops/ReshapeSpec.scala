package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Consistency tests for the reshape family (q79–q81): the reshaped
  * outputs must agree with the straight aggregates they were derived
  * from — melt round-trips, pivot margins, grouping-set subtotals. */
class ReshapeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q79 unpivot emits 3 measure rows per group that match the wide agg") {
    val long = Reshape.q79Unpivot(spark, sf).collect()
    val groups = long.map(r => (r.getString(0), r.getString(1))).distinct
    assert(long.length === groups.length * 3)
    // round-trip: the melted sum_qty must equal the direct aggregate
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    long.filter(_.getString(2) == "sum_qty").foreach { r =>
      assert(r.getLong(3) === direct((r.getString(0), r.getString(1))))
    }
  }

  test("q80 pivot margins: type-column sums equal the event total") {
    val p = Reshape.q80Pivot(spark, sf)
    val total = Tables.events(spark, sf).count()
    val cellSum = p.select(
      (col("click") + col("view") + col("signup") + col("purchase") +
        col("error")).as("s")).agg(sum("s")).collect()(0).getLong(0)
    assert(cellSum === total)
    // spot-check one (day, type) cell against a direct filter
    val first = p.orderBy("day").limit(1).collect()(0)
    val day = first.getString(0)
    val direct = Tables.events(spark, sf)
      .filter(to_date(col("ts")).cast("string") === day &&
        col("event_type") === "click").count()
    assert(first.getLong(1) === direct)
  }

  test("q81 grouping sets: subtotals reconcile across levels") {
    val g = Reshape.q81GroupingSets(spark, sf).collect()
    def rows(gid: Long) = g.filter(_.getLong(2) == gid)
    val detailQty = rows(0L).map(_.getLong(3)).sum
    val flagQty = rows(1L).map(_.getLong(3)).sum   // (flag) subtotal level
    val statusQty = rows(2L).map(_.getLong(3)).sum // (status) subtotal level
    val grand = rows(3L)
    assert(grand.length === 1)
    assert(grand(0).getString(0) === "ALL" && grand(0).getString(1) === "ALL")
    assert(detailQty === grand(0).getLong(3))
    assert(flagQty === grand(0).getLong(3))
    assert(statusQty === grand(0).getLong(3))
  }
}
