package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior tests for the round's robust-stats / fuzzy-match batch:
  * winsorized mean (q117), int8 quantization error (q118), linear
  * interpolation (q119), event trigrams (q120), and edit-distance
  * blocking (q121). */
class RobustStatsSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q117: clamping bounds come from the data and the mean moves inside them") {
    val out = Quality.winsorizedMean(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val lo = r.getAs[Long]("lo_cents"); val hi = r.getAs[Long]("hi_cents")
      val n = r.getAs[Long]("n")
      assert(lo <= hi)
      val mean = r.getAs[Long]("win_mean_milli")
      assert(mean >= lo * 1000 && mean <= hi * 1000)
      // clip fractions are ≤ 5% each by the rank definition (ranks
      // strictly below ⌈n/20⌉ on the low side, above ⌈19n/20⌉ high)
      assert(r.getAs[Long]("n_clipped_low") * 20 <= n)
      assert(r.getAs[Long]("n_clipped_high") * 20 <= n)
    }
  }

  test("q118: error is zero when the quantization grid hits every value exactly") {
    // Values laid out exactly on the 8-bit grid of [0, 255]·k: every
    // component reconstructs exactly → per-label SSE must be 0.
    val sse = Similarity.int8QuantErrorOn(
      Seq((1L, 0, Array(0f, 0.255f)), (2L, 0, Array(0.255f, 0f)),
        (3L, 1, Array(0.051f, 0.102f)))
        .toDF("vec_id", "label", "embedding"))
      .collect().map(r => r.getAs[Long]("label") -> r.getAs[Long]("sse_q2")).toMap
    assert(sse === Map(0L -> 0L, 1L -> 0L))
  }

  test("q118: a mid-code value rounds to the nearer code and reports the exact residual") {
    // One dimension, values {0, 1000, 3} at QScale: rng=1000, codes
    // u=round(255·x/1000); x=3 → u=1, dq=round(1000/255)=4, err=1.
    val out = Similarity.int8QuantErrorOn(
      Seq((1L, 0, Array(0f)), (2L, 0, Array(1f)), (3L, 1, Array(0.003f)))
        .toDF("vec_id", "label", "embedding")).collect()
    val byLabel = out.map(r =>
      r.getAs[Long]("label") -> r.getAs[Long]("sse_q2")).toMap
    assert(byLabel(0L) === 0L) // endpoints are exact
    assert(byLabel(1L) === 1L) // |3 − 4|² = 1
  }

  test("q119: interpolation is exact at event instants and monotone between two points") {
    val out = Relational.q119Interpolate(spark, sf)
    val rows = out.filter(col("prev_us").isNotNull && col("next_us").isNotNull
        && col("prev_us") =!= col("next_us")).limit(100).collect()
    assert(rows.nonEmpty)
    // interp lies between the neighbors' values (convexity of the
    // integer formula: frac ∈ [0, 1e6] and div truncates toward zero)
    val e = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        Det.cents(col("value")).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val pv = e((u, r.getAs[Long]("prev_us")))
      val nv = e((u, r.getAs[Long]("next_us")))
      val iv = r.getAs[Long]("interp_cents")
      assert(iv >= math.min(pv, nv) - 1 && iv <= math.max(pv, nv) + 1)
    }
  }

  test("q120: trigram counts are consistent with the transition matrix's totals") {
    val tri = Funnels.eventTriples(spark, sf).collect()
    assert(tri.nonEmpty && tri.length <= Funnels.TopTriples)
    val counts = tri.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // every trigram is also a valid bigram pair: its (e1,e2) count in
    // q107 must be ≥ the trigram count
    val bi = Funnels.markovTransitions(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n")).toMap
    tri.foreach { r =>
      val c = r.getAs[Long]("cnt")
      assert(bi((r.getAs[String]("e1"), r.getAs[String]("e2"))) >= c)
      assert(bi((r.getAs[String]("e2"), r.getAs[String]("e3"))) >= c)
    }
  }

  test("q121: pairs are within the distance cap and symmetric-canonical (a < b)") {
    val out = Dedup.editDistancePairs(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("edit_dist") <= Dedup.EditMaxDist)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
    // ground truth on constructed rows: one transposition inside the
    // head but outside the block prefix is found; a different prefix
    // escapes the blocking (the documented limitation)
    val docs = Seq(
      (1L, "abcdefgh one two three", "en", "s", 22L),
      (2L, "abcdefgh one tow three", "en", "s", 22L), // transposed "two"
      (3L, "Xbcdefgh one two three", "en", "s", 22L) // prefix differs
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val norm = trim(regexp_replace(col("text"), Det.WsClass + "+", " "))
    val d = docs.select(col("doc_id"), col("lang"),
        substring(norm, 1, Dedup.EditPrefixLen).as("blk"),
        substring(norm, 1, Dedup.EditHeadLen).as("head"))
      .filter(length(col("blk")) === Dedup.EditPrefixLen)
    val a = d.select(col("lang"), col("blk"), col("doc_id").as("doc_a"),
      col("head").as("head_a"))
    val b = d.select(col("lang"), col("blk"), col("doc_id").as("doc_b"),
      col("head").as("head_b"))
    val pairs = a.join(b, Seq("lang", "blk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("head_a"), col("head_b")).as("d"))
      .filter(col("d") <= Dedup.EditMaxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
