package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Funnel and cohort semantics on handcrafted event sequences: order
  * matters, chain breaks stay NULL, cohorts pin to first-seen weeks. */
class FunnelsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  /** u1 completes the funnel in order; u2 clicks BEFORE viewing (the
    * click must not count — only a later one would); u3 signs up only;
    * u4 never signs up (excluded entirely). */
  private lazy val dir: String = {
    val d = tmpDir("funnel")
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, "{}"),
      (2L, ts("2024-01-02 10:00:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-03 10:00:00"), 1L, "click", 0.0, "{}"),
      (4L, ts("2024-01-10 10:00:00"), 1L, "purchase", 0.0, "{}"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "signup", 0.0, "{}"),
      (6L, ts("2024-01-01 09:30:00"), 2L, "click", 0.0, "{}"), // before any view
      (7L, ts("2024-01-01 11:00:00"), 2L, "view", 0.0, "{}"),
      (8L, ts("2024-01-05 00:00:00"), 3L, "signup", 0.0, "{}"),
      (9L, ts("2024-01-01 08:00:00"), 4L, "view", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q60: steps count only in order; broken chains stay NULL; no signup, no row") {
    val got = Funnels.funnel(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i =>
        Option(r.get(i)).map(_.asInstanceOf[Long]))).toMap
    assert(got.keySet === Set(1L, 2L, 3L), "only signed-up users enter the funnel")
    assert(got(1L) === Seq(Some(us("2024-01-01 10:00:00")),
      Some(us("2024-01-02 10:00:00")), Some(us("2024-01-03 10:00:00")),
      Some(us("2024-01-10 10:00:00"))))
    // u2's 09:30 click precedes its 11:00 view → click step unreached
    assert(got(2L) === Seq(Some(us("2024-01-01 09:00:00")),
      Some(us("2024-01-01 11:00:00")), None, None))
    assert(got(3L) === Seq(Some(us("2024-01-05 00:00:00")), None, None, None))
  }

  test("q61: cohorts pin to first-seen week and count distinct actives per offset") {
    val got = Funnels.cohortRetention(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    // 2024-01-01 is a Monday: u1/u2/u4 cohort 2024-01-01 (u3 first seen
    // 2024-01-05 → same week). u1 is also active in week offset 1
    // (Jan 10 → week of Jan 8).
    assert(got === Map(
      ("2024-01-01", 0L) -> 4L,
      ("2024-01-01", 1L) -> 1L))
  }

  test("q107: transitions follow per-user (time, event_id) order; ppm row-normalizes") {
    // u1: signup→view→click→purchase; u2: signup→click→view (the 09:30
    // click precedes the 11:00 view in TIME, regardless of insert
    // order); u3/u4 have single events → no transitions
    val got = Funnels.markovTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(
      ("click", "purchase", 1L, 500000L),
      ("click", "view", 1L, 500000L),
      ("signup", "click", 1L, 500000L),
      ("signup", "view", 1L, 500000L),
      ("view", "click", 1L, 1000000L)))
  }

  test("q107: equal timestamps break ties by event_id") {
    val d = tmpDir("markov_tie")
    Seq(
      (2L, ts("2024-01-01 10:00:00"), 9L, "view", 0.0, "{}"),
      (1L, ts("2024-01-01 10:00:00"), 9L, "signup", 0.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 9L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    // event_id order pins signup (id 1) before view (id 2)
    val got = Funnels.markovTransitions(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("signup", "view", 1L), ("view", "click", 1L)))
  }

  test("q184: the churn quad conserves and matches a plain-Scala replay") {
    val sf = "/root/testdata/sf0.001"
    val out = Funnels.churnAccounting(spark, sf).collect()
      .map(r => r.getAs[Long]("wk") ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_churned"))).toMap
    assert(out.nonEmpty)
    val uw = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        expr("datediff(CAST(date_trunc('day', ts) AS DATE), DATE '1970-01-01') div 7")
          .as("wk")).distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("wk")))
    val byUser = uw.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val maxWk = uw.map(_._2).max
    val weeks = uw.map(_._2).distinct
    weeks.foreach { w =>
      val active = byUser.filter(_._2.contains(w))
      val nNew = active.count { case (_, ws) => ws.head == w }
      val nRet = active.count { case (_, ws) =>
        ws.head != w && ws.contains(w - 1) }
      val nRes = active.size - nNew - nRet
      val nChurn = byUser.count { case (_, ws) =>
        ws.contains(w - 1) && !ws.contains(w) && w <= maxWk }
      val (a, nw, rt, rs, ch) = out(w)
      assert(a === active.size.toLong, s"wk $w active")
      assert(nw === nNew.toLong && rt === nRet.toLong && rs === nRes.toLong,
        s"wk $w split")
      assert(ch === nChurn.toLong, s"wk $w churn")
      assert(a === nw + rt + rs)
      out.get(w - 1).foreach { case (pa, _, _, _, _) =>
        assert(ch === pa - rt, s"wk $w churn identity")
      }
    }
    // any extra emitted week is the zero-active/churn-only case
    (out.keySet -- weeks.toSet).foreach { w =>
      val (a, _, _, _, ch) = out(w)
      assert(a === 0L && ch > 0L, s"extra wk $w")
    }
  }

  test("q174: matrix powers match a plain-Scala ppm composition of q107's matrix") {
    val sf = "/root/testdata/sf0.001"
    val out = Funnels.markovPower(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("ppm1"), r.getAs[Long]("ppm2"), r.getAs[Long]("ppm3")))
      .toMap
    assert(out.nonEmpty)
    val p1 = Funnels.markovTransitions(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("ppm")).toMap
    def mult(x: Map[(String, String), Long], y: Map[(String, String), Long])
        : Map[(String, String), Long] =
      x.toSeq.flatMap { case ((a, b), px) =>
        y.collect { case ((`b`, c), py) => (a, c) -> px * py }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum / 1000000L).toMap
    val p2 = mult(p1, p1); val p3 = mult(p2, p1)
    val keys = p1.keySet ++ p2.keySet ++ p3.keySet
    assert(out.keySet === keys)
    keys.foreach { k =>
      assert(out(k) === (p1.getOrElse(k, 0L), p2.getOrElse(k, 0L),
        p3.getOrElse(k, 0L)), s"pair $k")
    }
    // row-stochastic sanity: each from's one-step ppm sums to ~1e6
    p1.keySet.map(_._1).foreach { a =>
      val rowSum = p1.collect { case ((`a`, _), p) => p }.sum
      assert(rowSum <= 1000000L && rowSum > 1000000L - 10L)
    }
  }
}
