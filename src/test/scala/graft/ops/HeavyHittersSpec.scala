package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CountMinAgg
import graft.SparkTestBase
import graft.functions.ArrayFunctions

/** Differential tests for the heavy-hitters family (q71): the sketch
  * grid, the estimates, and the heavy-key selection must equal a
  * plain-Scala count-min built over the SAME collected key list —
  * exact integer equality (count-min is deterministic given its hash
  * family, unlike HLL/GK). */
class HeavyHittersSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val D = HeavyHitters.CmDepth
  private val W = HeavyHitters.CmWidth

  private lazy val keys: Seq[Long] =
    graft.Tables.lineitem(spark, dir).select("l_partkey")
      .collect().map(_.getLong(0)).toSeq

  private lazy val refGrid: Array[Long] = {
    val g = new Array[Long](D * W)
    keys.foreach { x =>
      (0 until D).foreach(j => g(j * W + CountMinAgg.bucket(j, x, W)) += 1L)
    }
    g
  }

  private def refEstimate(x: Long): Long =
    (0 until D).map(j => refGrid(j * W + CountMinAgg.bucket(j, x, W))).min

  test("CountMinAgg grid equals the plain-Scala grid, under partial merge") {
    // 7 input partitions → several partial buffers per final merge
    val got = graft.Tables.lineitem(spark, dir)
      .repartition(7)
      .agg(ArrayFunctions.countMinSketch(col("l_partkey"), D, W))
      .collect().head.getSeq[Long](0)
    assert(got.toArray.sameElements(refGrid))
  }

  test("q71 equals a plain-Scala heavy-hitter computation") {
    val counts = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = keys.size.toLong
    val nKeys = counts.size.toLong
    val expected = counts.filter { case (_, c) => c * 5 * nKeys >= 7 * n }
      .toSeq.sortBy(_._1)
      .map { case (k, c) =>
        val est = refEstimate(k)
        val wb = if (est >= c && est <= c + (3 * n) / W) 1L else 0L
        (k, c, est, wb)
      }
    val got = HeavyHitters.heavyHitters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "threshold selects no keys at sf0.001")
    // the CM error bound must actually hold here, not just be emitted
    assert(got.forall(_._4 == 1L), "estimate outside the CM bound")
  }

  test("n_keys excludes the NULL-key group (count(DISTINCT) parity)") {
    import spark.implicits._
    // n=11, one non-null distinct key: threshold is 7·11/(5·1)=15.4,
    // so nothing passes. Were n_keys count(*) over the groups (=2,
    // counting the NULL group), 8·5·2=80 ≥ 77 would leak key 42 out.
    val ks1 = (Seq.fill(8)(Option(42L)) ++ Seq.fill(3)(Option.empty[Long]))
      .toDF("key")
    assert(HeavyHitters.heavyHittersOf(ks1).collect().isEmpty)
    // and with two real keys the frequent one still surfaces
    val ks2 = (Seq.fill(9)(Option(7L)) ++ Seq(Option(8L), Option.empty[Long]))
      .toDF("key")
    val got = HeavyHitters.heavyHittersOf(ks2).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L))
  }
}
