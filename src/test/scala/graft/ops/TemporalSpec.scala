package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior tests for the temporal batch: EWMA anomaly flags (q146),
  * activity streaks (q147), last-touch attribution (q148), session
  * paths (q149), and the compaction planner (q150). */
class TemporalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q146: forecast reproduces the integer EWMA of the daily census") {
    val out = Temporal.ewmaAnomaly(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(_.getAs[java.sql.Date]("day").getTime)
        .map(_.getAs[Long]("n"))).toMap
    val byType = out.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (typ, rows) =>
      val series = daily(typ)
      val lags = Temporal.EwmaWeights.size
      // q146 emits exactly the rows with a full lag window
      assert(rows.length === math.max(0, series.length - lags))
      rows.sortBy(_.getAs[java.sql.Date]("day").getTime)
        .zipWithIndex.foreach { case (r, i) =>
          val idx = i + lags // position in the full series
          val pred = Temporal.EwmaWeights.zipWithIndex.map {
            case (w, j) => w * series(idx - 1 - j)
          }.sum / Temporal.EwmaWeights.sum
          assert(r.getAs[Long]("pred") === pred)
          assert(r.getAs[Long]("n_events") === series(idx))
          val dev = (series(idx) - pred) * 1000 / math.max(pred, 1L)
          assert(r.getAs[Long]("dev_milli") === dev)
          assert(r.getAs[Long]("is_anomaly") ===
            (if (math.abs(dev) >= Temporal.AnomalyMilli) 1L else 0L))
        }
    }
  }

  test("q147: streak accounting matches a plain-Scala islands pass") {
    val out = Temporal.activityStreaks(spark, sf).collect()
    assert(out.nonEmpty)
    val days = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")).cast("date"),
          lit("1970-01-01").cast("date")).as("dn"))
      .distinct().collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Int]("dn")).sorted).toMap
    assert(out.length === days.size)
    out.foreach { r =>
      val dns = days(r.getAs[Long]("user_id"))
      val runs = dns.foldLeft((List.empty[Long], Int.MinValue)) {
        case ((h :: t, prev), d) if d == prev + 1 => ((h + 1) :: t, d)
        case ((acc, _), d) => (1L :: acc, d)
      }._1
      assert(r.getAs[Long]("n_active_days") === dns.length.toLong)
      assert(r.getAs[Long]("n_streaks") === runs.length.toLong)
      assert(r.getAs[Long]("longest_streak") === runs.max)
    }
  }

  test("q148: every purchase lands in exactly one channel; revenue conserved") {
    val out = Temporal.lastTouchAttribution(spark, sf).collect()
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(count(lit(1)).cast("long").as("n"),
        Det.lsum(Det.cents(col("value"))).as("cents")).collect().head
    assert(out.map(_.getAs[Long]("n_purchases")).sum === purchases.getAs[Long]("n"))
    assert(out.map(_.getAs[Long]("revenue_cents")).sum === purchases.getAs[Long]("cents"))
    val types = graft.Tables.events(spark, sf)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    out.foreach { r =>
      val ch = r.getAs[String]("channel")
      assert(ch == "direct" || (types.contains(ch) && ch != "purchase"))
    }
  }

  test("q149: league table is dense, sorted, and bounded by the session count") {
    val out = Temporal.sessionPaths(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("rank")).toSeq === (1L to out.length))
    val ns = out.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.nonEmpty && steps.length <= Temporal.PathSteps)
    }
    // paths can't outnumber sessions: every counted path is a session
    val events = graft.Tables.events(spark, sf).count()
    assert(ns.sum <= events)
  }

  test("q164: ACF matches a plain-Scala Pearson over the lagged census") {
    val out = Temporal.volumeAutocorr(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(_.getAs[java.sql.Date]("day").getTime)
        .map(_.getAs[Long]("cnt")).toSeq).toMap
    out.foreach { r =>
      val series = daily(r.getAs[String]("event_type"))
      val k = r.getAs[Long]("lag").toInt
      val pairs = series.drop(k).zip(series.dropRight(k)) // (cnt, lag cnt)
      val n = pairs.length.toLong
      assert(r.getAs[Long]("n_pairs") === n)
      val (as, bs) = (pairs.map(_._1), pairs.map(_._2))
      val num = BigInt(n) * pairs.map { case (a, b) => BigInt(a) * b }.sum -
        BigInt(as.sum) * bs.sum
      val da = BigInt(n) * as.map(a => BigInt(a) * a).sum - BigInt(as.sum) * as.sum
      val db = BigInt(n) * bs.map(b => BigInt(b) * b).sum - BigInt(bs.sum) * bs.sum
      assert(r.getAs[Long]("num") === num.toLong)
      assert(r.getAs[Long]("den_a") === da.toLong)
      assert(r.getAs[Long]("den_b") === db.toLong)
      if (da == 0 || db == 0) assert(r.isNullAt(r.fieldIndex("acf_milli")))
      else assert(r.getAs[Long]("acf_milli") ===
        math.round(1000.0 * num.toDouble / math.sqrt(da.toDouble * db.toDouble)))
    }
    // both probed lags appear for every type with enough history
    assert(out.map(_.getAs[Long]("lag")).distinct.sorted.toSeq ===
      Temporal.AcfLags.map(_.toLong))
  }

  test("q159: every purchase cent lands exactly once across channels") {
    val out = Temporal.linearAttribution(spark, sf).collect()
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(Det.lsum(Det.cents(col("value"))).as("c")).collect().head.getAs[Long]("c")
    // conservation: shares + remainders + direct = total purchase cents
    assert(out.map(_.getAs[Long]("attributed_cents")).sum === purchases)
    val types = graft.Tables.events(spark, sf)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    out.foreach { r =>
      val ch = r.getAs[String]("channel")
      assert(ch == "direct" || (types.contains(ch) && ch != "purchase"))
      assert(r.getAs[Long]("attributed_cents") >= 0L)
    }
    // multi-touch must spread credit wider than last-touch
    val lastTouch = Temporal.lastTouchAttribution(spark, sf).collect()
      .map(_.getAs[Long]("n_purchases")).sum
    assert(out.map(_.getAs[Long]("n_credits")).sum >= lastTouch)
  }

  test("q150: bins partition the day census; every row is packed once") {
    val out = Profiling.compactionPlan(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_rows")).sum ===
      graft.Tables.lineitem(spark, sf).count())
    val bins = out.map(_.getAs[Long]("bin"))
    assert(bins.toSeq === bins.sorted.toSeq)
    assert(bins.distinct.length === bins.length)
    out.foreach { r =>
      assert(r.getAs[Long]("n_files") >= 1L)
      assert(!r.getAs[java.sql.Date]("min_day").after(r.getAs[java.sql.Date]("max_day")))
    }
    // date spans of consecutive bins never interleave (date-local plan)
    out.toSeq.zip(out.toSeq.tail).foreach { case (a, b) =>
      assert(!a.getAs[java.sql.Date]("max_day").after(b.getAs[java.sql.Date]("min_day")))
    }
  }

  test("q153: one feature row per user; revenue and recency reconcile") {
    val out = Temporal.rfmFeatures(spark, sf).collect()
    val users = graft.Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.length === users.toInt)
    assert(out.map(_.getAs[Long]("user_id")).distinct.length === out.length)
    val totalRevenue = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(Det.lsum(Det.cents(col("value"))).as("c")).collect().head.getAs[Long]("c")
    assert(out.map(_.getAs[Long]("revenue_cents")).sum === totalRevenue)
    assert(out.exists(_.getAs[Long]("recency_days") === 0L),
      "someone must be active on the corpus's last day")
    out.foreach { r =>
      assert(r.getAs[Long]("recency_days") >= 0L)
      assert(r.getAs[Long]("n_active_days") <= r.getAs[Long]("n_events"))
      assert(r.getAs[String]("top_type").nonEmpty)
    }
  }

  test("q154: positions cover every event; rate is exact integer ppm") {
    val out = Temporal.positionConversion(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_events")).sum ===
      graft.Tables.events(spark, sf).count())
    val positions = out.map(_.getAs[Long]("position"))
    assert(positions.forall(p => p >= 1L && p <= Temporal.PosCap))
    // position-1 rows = number of sessions; later positions can't exceed it
    val p1 = out.find(_.getAs[Long]("position") === 1L).get.getAs[Long]("n_events")
    out.foreach { r =>
      if (r.getAs[Long]("position") < Temporal.PosCap)
        assert(r.getAs[Long]("n_events") <= p1)
      assert(r.getAs[Long]("purchase_ppm") ===
        r.getAs[Long]("n_purchases") * 1000000L / r.getAs[Long]("n_events"))
    }
  }

  test("q165: window closed form equals the textbook max(0,·) CUSUM recursion") {
    val out = Temporal.cusumShift(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(_.getAs[java.sql.Date]("day").getTime)
        .map(_.getAs[Long]("n"))).toMap
    val byType = out.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (typ, rows) =>
      val series = daily(typ)
      val b = Temporal.CusumBaselineDays
      assert(rows.length === math.max(0, series.length - b))
      val mu = series.take(b).sum / b
      val k = mu * Temporal.CusumSlackPct / 100
      val h = math.max(mu, 1L) * Temporal.CusumThresholdX
      var sPos = 0L; var sNeg = 0L
      rows.sortBy(_.getAs[java.sql.Date]("day").getTime)
        .zipWithIndex.foreach { case (r, i) =>
          val x = series(b + i)
          sPos = math.max(0L, sPos + (x - mu - k))
          sNeg = math.max(0L, sNeg + (mu - x - k))
          assert(r.getAs[Long]("baseline") === mu)
          assert(r.getAs[Long]("s_pos") === sPos, s"$typ day $i s_pos")
          assert(r.getAs[Long]("s_neg") === sNeg, s"$typ day $i s_neg")
          assert(r.getAs[Long]("is_shift") ===
            (if (sPos >= h || sNeg >= h) 1L else 0L))
        }
    }
  }

  test("q181: WAU equals the brute-force trailing-window distinct count") {
    val out = Temporal.rollingActiveUsers(spark, sf).collect()
      .map(r => r.getAs[java.sql.Date]("report_day").toLocalDate ->
        r.getAs[Long]("wau")).toMap
    assert(out.nonEmpty)
    val ud = graft.Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toLocalDate))
    val first = ud.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val last = ud.map(_._2).max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    // every day from the first active day to the last must be present
    assert(out.keySet.map(_.toEpochDay) ===
      (first.toEpochDay to last.toEpochDay).toSet)
    out.foreach { case (d, wau) =>
      val expect = ud.filter { case (_, ad) =>
        !ad.isAfter(d) &&
          ad.toEpochDay > d.toEpochDay - Temporal.WauWindowDays
      }.map(_._1).distinct.length.toLong
      assert(wau === expect, s"day $d")
    }
  }

  test("q172: slope matches a plain-Scala least squares over the daily census") {
    val out = Temporal.volumeTrend(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(_.getAs[java.sql.Date]("day").getTime)
        .map(_.getAs[Long]("n"))).toMap
    assert(out.length === daily.size)
    out.foreach { r =>
      val series = daily(r.getAs[String]("event_type"))
      val xy = series.zipWithIndex.map { case (y, i) => (BigInt(i + 1), BigInt(y)) }
      val n = BigInt(xy.length)
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map { case (x, y) => x * y }.sum
      val sxx = xy.map { case (x, _) => x * x }.sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      assert(r.getAs[Long]("n_days") === xy.length.toLong)
      assert(r.getAs[Long]("num") === num.toLong)
      assert(r.getAs[Long]("den") === den.toLong)
      assert(r.getAs[Long]("slope_milli") ===
        math.round(1000.0 * num.toDouble / den.toDouble))
    }
  }

  test("q166: components reconstruct exactly; trend is the centered integer mean") {
    val out = Temporal.seasonalDecompose(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(_.getAs[java.sql.Date]("day").getTime)).toMap
    val half = Temporal.DecompHalf
    val byType = out.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (typ, rows) =>
      val series = daily(typ).map(_.getAs[Long]("n"))
      assert(rows.length === math.max(0, series.length - 2 * half))
      rows.sortBy(_.getAs[java.sql.Date]("day").getTime)
        .zipWithIndex.foreach { case (r, i) =>
          val idx = i + half
          val trend = (idx - half to idx + half).map(series).sum / (2 * half + 1)
          assert(r.getAs[Long]("trend") === trend, s"$typ row $i trend")
          assert(r.getAs[Long]("n_events") === series(idx))
          assert(r.getAs[Long]("n_events") ===
            r.getAs[Long]("trend") + r.getAs[Long]("seasonal") +
              r.getAs[Long]("residual"))
        }
      // seasonal is a pure function of (type, dow): same dow → same value
      val byDow = rows.groupBy { r =>
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay % 7
      }
      byDow.values.foreach { g =>
        assert(g.map(_.getAs[Long]("seasonal")).distinct.length === 1)
      }
    }
  }
}
