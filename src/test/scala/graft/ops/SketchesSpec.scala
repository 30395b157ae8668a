package graft.ops

import graft.SparkTestBase

/** Error-bound verification for the sketch aggregates (no cross-engine
  * oracle exists by construction — see Sketches). */
class SketchesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("q39 HLL++ distinct estimates sit within ±5% of exact") {
    val rows = Sketches.sketchDistinct(spark, dir).collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_customers").toDouble
      val exact = r.getAs[Long]("exact_customers").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"nation ${r.get(0)}: approx $approx vs exact $exact")
    }
  }

  test("q40 GK quantiles bracket the exact percentiles") {
    val rows = Sketches.quantileSketch(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = Seq(r.getAs[Double]("approx_p50"), r.getAs[Double]("approx_p95"))
      val exact = Seq(r.getAs[Double]("exact_p50"), r.getAs[Double]("exact_p95"))
      // GK at accuracy 1e4 over <=15k rows per group: rank error <= 1
      // rank; translate to a loose 2% value tolerance on this data
      approx.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.02, s"approx $a vs exact $e")
      }
      assert(approx.head <= approx(1)) // p50 <= p95
    }
  }

  test("sketch queries stay deterministic across runs") {
    val a = Sketches.sketchDistinct(spark, dir).collect().toSeq
    val b = Sketches.sketchDistinct(spark, dir).collect().toSeq
    assert(a === b)
  }
}
