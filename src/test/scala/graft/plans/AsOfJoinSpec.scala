package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The custom as-of join: semantics on constructed series, plan shape
  * (one exchange per side, streamed merge node), and equivalence with
  * the window formulation on real data. */
class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "AAPL", ts("2026-01-01 10:00:00")), // before any quote → null
    (2L, "AAPL", ts("2026-01-01 10:05:00")), // exactly at quote A → A (inclusive)
    (3L, "AAPL", ts("2026-01-01 10:07:30")), // between A and B → A
    (4L, "AAPL", ts("2026-01-01 11:00:00")), // after last quote → B
    (5L, "MSFT", ts("2026-01-01 10:06:00")), // other key → its own quote
    (6L, "NOQT", ts("2026-01-01 10:06:00")), // key with no quotes → null
    (7L, null, ts("2026-01-01 10:06:00")),   // null key → null
    (8L, "AAPL", null)                       // null ts → null
  ).toDF("trade_id", "symbol", "trade_ts")

  private lazy val quotes = Seq(
    ("AAPL", ts("2026-01-01 10:05:00"), 101.0), // A
    ("AAPL", ts("2026-01-01 10:10:00"), 102.0), // B
    ("MSFT", ts("2026-01-01 10:01:00"), 55.0),
    ("IGNR", ts("2026-01-01 09:00:00"), 1.0),   // unprobed key
    (null, ts("2026-01-01 09:00:00"), 2.0),     // null key: never a match
    ("AAPL", null, 3.0)                          // null ts: never a match
  ).toDF("q_symbol", "quote_ts", "price")

  private def joined = AsOf.join(
    trades, quotes.withColumnRenamed("q_symbol", "symbol"),
    keys = Seq("symbol"), leftTs = "trade_ts", rightTs = "quote_ts")

  test("as-of semantics: inclusive boundary, last-before, outer nulls") {
    val got = joined.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("price")).map(_.toDouble))
      .toMap
    assert(got === Map(
      1L -> None, 2L -> Some(101.0), 3L -> Some(101.0), 4L -> Some(102.0),
      5L -> Some(55.0), 6L -> None, 7L -> None, 8L -> None))
  }

  test("plan: AsOfJoinExec with exactly one shuffle per side") {
    // AQE wraps stages opaquely; assert on the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = joined.queryExecution.executedPlan
      val execs = plan.collect { case e: AsOfJoinExec => e }
      assert(execs.size === 1)
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size === 2, "one hash exchange per side, nothing more")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("every right row at the same (key, ts) — last in sort order wins deterministically") {
    val l = Seq((1L, "K", ts("2026-01-01 00:00:10"))).toDF("id", "k", "lts")
    val r = Seq(("K", ts("2026-01-01 00:00:05"), "first"),
      ("K", ts("2026-01-01 00:00:05"), "second"))
      .toDF("k", "rts", "tag")
    // ties on (key, ts) are broken by right sort order; dedupe the right
    // side when ties are semantically possible (q45 does)
    val tag = AsOf.join(l, r, Seq("k"), "lts", "rts").select("tag").head().getString(0)
    assert(Set("first", "second").contains(tag))
  }

  test("tieBreak pins ties: max wins backward, min wins forward, candidates unaffected") {
    val l = Seq((1L, "K", ts("2026-01-01 00:00:10"))).toDF("id", "k", "lts")
    // seq breaks the (key, ts) tie; rows arrive in adversarial order
    val r = Seq(
      ("K", ts("2026-01-01 00:00:05"), 7L, "v7"),
      ("K", ts("2026-01-01 00:00:05"), 9L, "v9"),
      ("K", ts("2026-01-01 00:00:05"), 8L, "v8"),
      ("K", ts("2026-01-01 00:00:20"), 1L, "after-lo"),
      ("K", ts("2026-01-01 00:00:20"), 3L, "after-hi"),
      ("K", ts("2026-01-01 00:00:20"), 2L, "after-mid"))
      .toDF("k", "rts", "seq", "tag").repartition(4)
    (1 to 3).foreach { _ =>
      val back = AsOf.join(l, r, Seq("k"), "lts", "rts", tieBreak = Seq("seq"))
        .select("tag").head().getString(0)
      assert(back === "v9", "backward attaches the greatest tiebreak among ties")
      val fwd = AsOf.join(l, r, Seq("k"), "lts", "rts",
        direction = "forward", tieBreak = Seq("seq"))
        .select("tag").head().getString(0)
      assert(fwd === "after-lo", "forward attaches the least tiebreak among ties")
    }
  }

  test("q45 (custom operator) ≡ q21 (window formulation) on real data") {
    val dir = "/root/testdata/sf0.001"
    val viaOp = graft.ops.Relational.q45AsOfJoinCustom(spark, dir).collect().toSeq
    val viaWindow = graft.ops.Relational.q21AsOfLastSignup(spark, dir).collect().toSeq
    assert(viaOp.nonEmpty)
    assert(viaOp === viaWindow)
  }

  test("mismatched shapes are rejected with clear errors") {
    assertThrows[IllegalArgumentException] { // no keys
      AsOf.join(trades, quotes, Seq.empty, "trade_ts", "quote_ts")
    }
    assertThrows[RuntimeException] { // missing column
      AsOf.join(trades, quotes, Seq("nope"), "trade_ts", "quote_ts")
    }
    assertThrows[IllegalArgumentException] { // shared attribute instances
      AsOf.join(trades, trades, Seq("symbol"), "trade_ts", "trade_ts")
    }
  }
}
