package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior tests for the governance/normalization batch: percentile-
  * rank normalization (q126), gap histogram (q127), k-anonymity
  * (q128), and totals reconciliation (q129). */
class GovernanceSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q126: percentile ranks span [0, 1e6] per source and preserve score order") {
    val out = CorpusPrep.rankNormalize(spark, sf).collect()
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r =>
        (r.getAs[Long]("score_ppm"), r.getAs[Long]("doc_id")))
      val pcts = sorted.map(_.getAs[Long]("pct_ppm"))
      assert(pcts.head === 0L)
      if (rows.length > 1) assert(pcts.last === 1000000L)
      assert(pcts.zip(pcts.tail).forall { case (a, b) => a <= b },
        "pct must be monotone in (score, doc_id) order")
    }
  }

  test("q127: buckets are bit lengths (≥1) and per-type shares sum to ~1e6") {
    val out = Funnels.gapHistogram(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("bucket") >= 1L))
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      val share = rows.map(_.getAs[Long]("ppm")).sum
      // truncating div loses < 1 ppm per bucket
      assert(share <= 1000000L && share > 1000000L - rows.length)
    }
  }

  test("q128: every reported cell is genuinely under k; no cell at or above k leaks") {
    val out = Quality.kAnonymity(spark, sf).collect()
    out.foreach(r => assert(r.getAs[Long]("n") < Quality.KAnon))
    val full = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n"))
    val risky = full.filter(col("n") < Quality.KAnon).count()
    assert(risky === out.length.toLong)
  }

  test("q129: a constructed consistent order reconciles; totals partition all orders") {
    val out = Quality.totalsReconcile(spark, sf).collect()
    val nOrders = out.map(_.getAs[Long]("n_orders")).sum
    assert(nOrders === graft.Tables.orders(spark, sf).count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_mismatch") <= r.getAs[Long]("n_orders"))
      assert(r.getAs[Long]("max_diff_cents") >= 0L)
    }
    // mechanism check on constructed rows: total == charge → 0 diff
    val charge = BigDecimal(1234.56) * (1 - 0.05) * (1 + 0.08)
    val li = Seq((1L, 1234.56, 0.05, 0.08)).toDF(
      "l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val derived = li.groupBy("l_orderkey")
      .agg(Det.lsum(Det.fixed(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * (lit(1.0) + col("l_tax")), 6)).as("charge_e6"))
    val o = Seq((1L, charge.toDouble)).toDF("o_orderkey", "o_totalprice")
    val diff = o.join(derived, col("o_orderkey") === col("l_orderkey"))
      .select(abs(Det.cents(col("o_totalprice")).cast("long")
        - expr("charge_e6 div 10000")).as("d"))
      .collect()(0).getLong(0)
    assert(diff <= 1L, s"self-consistent order drifted by $diff cents")
  }
}
