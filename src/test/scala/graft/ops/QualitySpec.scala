package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Quality ops on constructed dirty data: every rule must fire on the
  * row built to break it and only that row; the profile must count
  * nulls/distincts exactly. */
class QualitySpec extends SparkTestBase {

  import spark.implicits._

  private lazy val dir: String = {
    val d = tmpDir("quality")
    Seq(
      (1L, 10L, "O", 100.50, java.sql.Date.valueOf("2024-01-01"), "1-URGENT"),
      (2L, 11L, "F", 200.00, java.sql.Date.valueOf("2024-02-01"), "5-LOW"),
      (3L, 10L, null, 300.25, null, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    Seq(
      // clean row
      (1L, 1L, 1L, 1L, 10.0, 100.0, 0.05, 0.02, "N", "O", "2024-01-05"),
      // quantity out of range
      (1L, 2L, 2L, 2L, 99.0, 100.0, 0.05, 0.02, "N", "O", "2024-01-06"),
      // discount out of range
      (2L, 3L, 3L, 1L, 10.0, 100.0, 0.90, 0.02, "N", "O", "2024-02-05"),
      // non-positive price
      (2L, 4L, 4L, 2L, 10.0, 0.0, 0.05, 0.02, "N", "O", "2024-02-06"),
      // orphan orderkey
      (999L, 5L, 5L, 1L, 10.0, 100.0, 0.05, 0.02, "N", "O", "2024-03-01"))
      .map { case (ok, pk, sk, ln, q, p, disc, tax, rf, ls, sd) =>
        (ok, pk, sk, ln, q, p, disc, tax, rf, ls, java.sql.Date.valueOf(sd))
      }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("q62 profiles nulls, distincts, and canonical min/max per column") {
    val got = Quality.profile(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet.size === 6)
    got.values.foreach(r => assert(r.getAs[Long]("n_rows") === 3L))
    val status = got("o_orderstatus")
    assert(status.getAs[Long]("n_nulls") === 1L)
    assert(status.getAs[Long]("n_distinct") === 2L)
    assert(status.getAs[String]("min_repr") === "F" &&
      status.getAs[String]("max_repr") === "O")
    val price = got("o_totalprice")
    assert(price.getAs[String]("min_repr") === "10050" &&
      price.getAs[String]("max_repr") === "30025", "doubles profile as exact cents")
    val date = got("o_orderdate")
    assert(date.getAs[Long]("n_nulls") === 1L)
    assert(date.getAs[String]("min_repr") === "2024-01-01")
    assert(got("o_custkey").getAs[Long]("n_distinct") === 2L)
  }

  test("q63 counts exactly one violation per dirty row, per rule") {
    val got = Quality.constraints(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "quantity_range" -> 1L,
      "discount_range" -> 1L,
      "price_positive" -> 1L,
      "orderkey_exists" -> 1L))
  }

  test("q78 IQR fences: rank-exact quartiles, zero-IQR group, negative values") {
    val d = tmpDir("iqr")
    // type a: n=8, sorted cents 10..70 + 10000 → q1 = rank 2 (20),
    //   q3 = rank 6 (60), iqr 40, high fence 120 → exactly one high.
    // type b: n=5 with iqr 0 → fences collapse to the median value;
    //   the -500 row sits below → one low outlier, none high.
    val rows =
      Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 10000L).zipWithIndex.map {
        case (c, i) => (i.toLong, 1000000L + i, "a", c / 100.0)
      } ++ Seq(-500L, 100L, 100L, 100L, 100L).zipWithIndex.map {
        case (c, i) => (100L + i, 2000000L + i, "b", c / 100.0)
      }
    rows.toDF("event_id", "us", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.parquet(s"$d/events.parquet")
    val got = Quality.iqrOutliers(spark, d).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      ("a", 8L, 20L, 60L, 40L, 0L, 1L),
      ("b", 5L, 100L, 100L, 0L, 1L, 0L)))
  }

  test("q90 rolling weighted mean matches a plain-Scala 4-tap kernel") {
    val sf = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = events.groupBy(_._1).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.map { i =>
        val taps = Seq(8L, 4L, 2L, 1L).zipWithIndex
          .filter { case (_, k) => i - k >= 0 }
          .map { case (w, k) => (w, sorted(i - k)._4) }
        val num = taps.map { case (w, c) => w * c }.sum * 1000L
        val den = taps.map(_._1).sum
        (sorted(i)._1, sorted(i)._2) -> (num / den)
      }
    }
    val got = Quality.rollingWavg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got.size === expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) === v, s"wavg mismatch at $k")
    }
  }

  test("q158: reported cells are exactly the low-diversity ones") {
    val sf = "/root/testdata/sf0.001"
    val out = Quality.lDiversity(spark, sf).collect()
    // plain-Scala census over the joined frame
    val nations = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        r.getAs[Number]("c_nationkey").longValue).toMap
    val cells = graft.Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_custkey")).collect()
      .flatMap { r =>
        nations.get(r.getAs[Long]("o_custkey")).map(n =>
          ((r.getAs[String]("o_orderstatus"), r.getAs[String]("o_orderpriority"),
            r.getAs[java.sql.Date]("month").toString), n))
      }
      .groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).distinct.length.toLong))
      .filter(_._2._2 < Quality.LDiv).toMap
    assert(out.length === cells.size)
    out.foreach { r =>
      val key = (r.getAs[String]("o_orderstatus"), r.getAs[String]("o_orderpriority"),
        r.getAs[java.sql.Date]("month").toString)
      assert(cells(key) === (r.getAs[Long]("n"), r.getAs[Long]("l_distinct")))
      // every reported cell is genuinely low-diversity, can still be k-anonymous
      assert(r.getAs[Long]("l_distinct") < Quality.LDiv)
      assert(r.getAs[Long]("l_distinct") <= r.getAs[Long]("n"))
    }
  }

  test("q175: Benford constants are exact; digit census replays in plain Scala") {
    // the embedded ppm literals are round(1e6·log10(1+1/d)) and total 1e6
    Quality.BenfordPpm.zipWithIndex.foreach { case (p, i) =>
      assert(p === math.round(1e6 * math.log10(1.0 + 1.0 / (i + 1))))
    }
    assert(Quality.BenfordPpm.sum === 1000000L)
    val sf = "/root/testdata/sf0.001"
    val out = Quality.benfordAudit(spark, sf).collect()
    val cents = graft.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("o_totalprice") * 100)
        .cast("long").as("c")).collect().map(_.getLong(0))
    val byDigit = cents.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.map(_.getAs[Long]("n")).sum === cents.length.toLong)
    out.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(r.getAs[Long]("n") === byDigit(d))
      assert(r.getAs[Long]("share_ppm") ===
        byDigit(d) * 1000000L / cents.length)
      assert(r.getAs[Long]("benford_ppm") ===
        Quality.BenfordPpm(d.toInt - 1))
      assert(r.getAs[Long]("dev_ppm") ===
        r.getAs[Long]("share_ppm") - r.getAs[Long]("benford_ppm"))
    }
  }
}
