package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.ArrayFunctions

/** Bloom semi-join (q85) and Z-order locality (q86) behavior tests:
  * the bloom probe must have NO false negatives (losslessness of the
  * composed plan), and z-buckets must be axis-aligned boxes of the
  * advertised side length (the data-skipping property). */
class PruningSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom probe admits every inserted key (no false negatives)") {
    val keys = (0L until 5000L by 7L).toDF("k")
    val bloom = keys.agg(
      ArrayFunctions.bloomFilterAgg(col("k"), 64, 4).as("bits"))
    val missed = keys.crossJoin(bloom)
      .filter(!ArrayFunctions.bloomMightContain(col("bits"), col("k"), 64, 4))
      .count()
    assert(missed === 0L)
  }

  test("bloom agg and probe agree above the old 2^39 key ceiling") {
    // Keys where the unfolded A*x product overflows signed 64-bit:
    // the fold-mod-P family must still admit every inserted key.
    val big = Seq(1L << 39, (1L << 45) + 17L, (1L << 62) + 3L,
      Long.MaxValue, 0L, CountMinAggP - 1L, CountMinAggP).toDF("k")
    val bloom = big.agg(
      ArrayFunctions.bloomFilterAgg(col("k"), 64, 4).as("bits"))
    val missed = big.crossJoin(bloom)
      .filter(!ArrayFunctions.bloomMightContain(col("bits"), col("k"), 64, 4))
      .count()
    assert(missed === 0L)
  }

  test("bloom agg fails loudly on a negative key") {
    val ex = intercept[Exception] {
      Seq(-1L).toDF("k")
        .agg(ArrayFunctions.bloomFilterAgg(col("k"), 64, 4)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c =>
        c.getMessage != null && c.getMessage.contains("non-negative")))
  }

  private val CountMinAggP = org.apache.spark.sql.graftbridge.CountMinAgg.P

  test("bloom probe answers false (not a crash or arbitrary read) for negative keys") {
    // The build side rejects negatives loudly, so a negative fact key
    // is provably absent — the probe must say false. Unguarded,
    // Java's signed % made every bit position negative: element_at
    // index 0 throws, index ≤ −64 silently reads a word from the END
    // of the array.
    val keys = (0L until 100L).toDF("k")
    val bloom = keys.agg(
      ArrayFunctions.bloomFilterAgg(col("k"), 64, 4).as("bits"))
    val got = Seq(-1L, -63L, -64L, -100L, Long.MinValue, 5L).toDF("k")
      .crossJoin(bloom)
      .filter(ArrayFunctions.bloomMightContain(col("bits"), col("k"), 64, 4))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(5L), "only the present non-negative key probes true")
  }

  test("bloom probe rejects parameters the aggregate would reject") {
    intercept[IllegalArgumentException] {
      ArrayFunctions.bloomMightContain(col("b"), col("k"), 63, 4)
    }
    intercept[IllegalArgumentException] {
      ArrayFunctions.bloomMightContain(col("b"), col("k"), 64, 0)
    }
    intercept[IllegalArgumentException] {
      ArrayFunctions.bloomMightContain(col("b"), col("k"), 64, 5)
    }
  }

  test("bloom probe rejects most absent keys (false-positive rate sane)") {
    val keys = (0L until 4096L).toDF("k") // 4096 keys in 2^18 bits
    val bloom = keys.agg(
      ArrayFunctions.bloomFilterAgg(col("k"), Pruning.BloomWords,
        Pruning.BloomK).as("bits"))
    val absent = (100000L until 110000L).toDF("k")
    val fp = absent.crossJoin(bloom)
      .filter(ArrayFunctions.bloomMightContain(col("bits"), col("k"),
        Pruning.BloomWords, Pruning.BloomK))
      .count()
    // theoretical fp ≈ (1-e^(-kn/m))^k ≈ 2e-5 here; allow 100× slack
    assert(fp < 20L, s"false positives: $fp / 10000")
  }

  test("q85 equals the plain exact semi-join (bloom is lossless)") {
    val got = Pruning.bloomSemiJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val dim = Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= 450000.0).select("o_orderkey")
    val expect = Tables.lineitem(spark, sf)
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum("l_quantity").cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * 100)).cast("long")
          .as("sum_price_cents"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === expect)
  }

  test("zValue matches a plain-Scala Morton reference") {
    def refZ(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L))
    val got = pts.toDF("x", "y")
      .select(Pruning.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (x, y) => refZ(x, y) })
  }

  test("q86 buckets are axis-aligned boxes with side ≤ 2^(16-p)") {
    val side = 1L << (16 - 8) // AxisBits=16, BucketBits=8
    Pruning.zorderStats(spark, sf).collect().foreach { r =>
      val (b, maxX, minX) = (r.getLong(0), r.getLong(3), r.getLong(2))
      val (maxY, minY) = (r.getLong(5), r.getLong(4))
      assert(maxX - minX < side, s"bucket $b x-span")
      assert(maxY - minY < side, s"bucket $b y-span")
      // the box's corner is determined by de-interleaving the bucket id
      var (cx, cy) = (0L, 0L)
      for (i <- 0 until 8) {
        cx |= ((b >> (2 * i)) & 1L) << i
        cy |= ((b >> (2 * i + 1)) & 1L) << i
      }
      assert(minX >> 8 === cx, s"bucket $b x-corner")
      assert(minY >> 8 === cy, s"bucket $b y-corner")
    }
  }
}
