package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Error-bound verification for the sketch aggregates. The driver's
  * oracle hash-checks the exact integer side plus the `within_bound`
  * flag (see Sketches); these tests check the RAW estimates the hash
  * deliberately excludes, via the `*Detail` methods. */
class SketchesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("q39 HLL++ distinct estimates sit within ±5% of exact, flag = 1") {
    val rows = Sketches.sketchDistinctDetail(spark, dir).collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_customers").toDouble
      val exact = r.getAs[Long]("exact_customers").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"nation ${r.get(0)}: approx $approx vs exact $exact")
      assert(r.getAs[Int]("within_bound") === 1)
    }
  }

  test("q40 GK quantiles bracket the exact percentiles, flag = 1") {
    val rows = Sketches.quantileSketchDetail(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // exact_*_e4 is price ×10⁴ (cents × centi-fraction); approx is
      // an actual data element in cents. GK at accuracy 1e4 over <=15k
      // rows per group: rank error <= ~1 rank; translate to a loose 2%
      // value tolerance on this data.
      val approx = Seq(r.getAs[Long]("approx_p50_cents") * 100.0,
        r.getAs[Long]("approx_p95_cents") * 100.0)
      val exact = Seq(r.getAs[Long]("exact_p50_e4").toDouble,
        r.getAs[Long]("exact_p95_e4").toDouble)
      approx.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.02, s"approx $a vs exact $e")
      }
      assert(approx.head <= approx(1)) // p50 <= p95
      assert(r.getAs[Int]("within_bound") === 1)
    }
  }

  test("q40 exact integer interpolation matches a plain-Scala percentile") {
    import org.apache.spark.sql.functions._
    val cents = graft.Tables.orders(spark, dir)
      .select(col("o_orderstatus"), expr("cast(round(o_totalprice*100) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    def interpE4(xs: Array[Long], p: Int): Long = {
      val pos = (xs.length - 1).toLong * p
      val lo = (pos / 100).toInt; val frac = pos % 100
      xs(lo) * (100 - frac) +
        (if (frac > 0) xs(lo + 1) * frac else 0L)
    }
    val got = Sketches.quantileSketch(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("exact_p50_e4"),
        r.getAs[Long]("exact_p95_e4"))).toMap
    cents.foreach { case (status, xs) =>
      assert(got(status) === ((interpE4(xs, 50), interpE4(xs, 95))),
        s"status $status")
    }
  }

  test("sketch queries stay deterministic across runs") {
    val a = Sketches.sketchDistinctDetail(spark, dir).collect().toSeq
    val b = Sketches.sketchDistinctDetail(spark, dir).collect().toSeq
    assert(a === b)
  }

  test("q140: merged weekly sketches equal the direct weekly sketch, inside the bound") {
    val out = Sketches.sketchRollup(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("merge_consistent") === 1L,
        "HLL union of daily sketches must equal the sketch of the week")
      assert(r.getAs[Long]("within_bound") === 1L)
    }
  }

  test("q141: merged daily partials equal a direct aggregation") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = Sketches.statsRollup(spark, sf).collect()(0)
    val direct = graft.Tables.events(spark, sf)
      .agg(count(lit(1)), sum(graft.ops.Det.cents(col("value")).cast("long")),
        min(graft.ops.Det.cents(col("value")).cast("long")),
        max(graft.ops.Det.cents(col("value")).cast("long")))
      .collect()(0)
    assert(out.getAs[Long]("n_rows") === direct.getLong(0))
    assert(out.getAs[Long]("sum_cents") === direct.getLong(1))
    assert(out.getAs[Long]("min_cents") === direct.getLong(2))
    assert(out.getAs[Long]("max_cents") === direct.getLong(3))
  }

  test("q160: overlap matches a plain-Scala set census; estimates stay in bound") {
    val sf = "/root/testdata/sf0.001"
    val out = Sketches.overlapSketch(spark, sf).collect()
    assert(out.nonEmpty)
    val sets = graft.Tables.events(spark, sf)
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // every reported pair reproduces the exact set algebra
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b)
      val (sa, sb) = (sets(a), sets(b))
      val overlap = sa.intersect(sb).size.toLong
      assert(r.getAs[Long]("exact_a") === sa.size.toLong)
      assert(r.getAs[Long]("exact_b") === sb.size.toLong)
      assert(r.getAs[Long]("exact_overlap") === overlap)
      assert(r.getAs[Long]("jaccard_ppm") ===
        overlap * 1000000L / sa.union(sb).size)
      assert(r.getAs[Long]("within_bound") === 1L,
        s"HLL inclusion-exclusion out of bound for ($a, $b)")
    }
    // every overlapping pair is reported (zero-overlap pairs absent)
    val expectPairs = sets.keys.toSeq.sorted.combinations(2)
      .filter { case Seq(a, b) => sets(a).intersect(sets(b)).nonEmpty }.size
    assert(out.length === expectPairs)
  }

  test("q161: merged partials equal the rebuild for every nation") {
    val sf = "/root/testdata/sf0.001"
    val out = Sketches.mvIncremental(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("merge_consistent") === 1L,
      s"partial merge diverged for ${r.getAs[String]("n_name")}"))
    // the MV's totals reconcile with the raw fact table
    assert(out.map(_.getAs[Long]("n_orders")).sum ===
      graft.Tables.orders(spark, sf).count())
    val direct = graft.Tables.orders(spark, sf)
      .select(graft.ops.Det.lsum(graft.ops.Det.cents(col("o_totalprice"))).as("c"))
      .collect().head.getAs[Long]("c")
    assert(out.map(_.getAs[Long]("revenue_cents")).sum === direct)
  }
}
