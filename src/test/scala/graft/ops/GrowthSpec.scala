package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior tests for the growth/reporting batch: growth accounting
  * (q135), association lift (q136), week-over-week change (q137),
  * conversion latency (q138), and media dedup accounting (q139). */
class GrowthSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q135: new+returning = active; cumulative ends at the user count") {
    val out = Funnels.growthAccounting(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_returning")
        === r.getAs[Long]("n_active"))
    }
    val cums = out.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last ===
      graft.Tables.events(spark, sf).select("user_id").distinct().count())
    assert(out.map(_.getAs[Long]("n_new")).sum === cums.last)
  }

  test("q136: lift is mass-weighted around 1000 milli per language") {
    val out = Profiling.langSourceLift(spark, sf).collect()
    assert(out.nonEmpty)
    // Σ_cells o·lift = Σ o·o·N/(r·c); weaker sanity: every lift > 0
    // and each language has at least one cell ≥ 1000 (a row's mass
    // must be at or above independence somewhere)
    out.foreach(r => assert(r.getAs[Long]("lift_milli") > 0))
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      assert(rows.exists(_.getAs[Long]("lift_milli") >= 900),
        "every language needs a near-or-above-independence cell")
    }
  }

  test("q137: deltas reproduce the counts and the first week has no baseline") {
    val out = Funnels.wowChange(spark, sf).collect()
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[java.sql.Date]("week").getTime)
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("prev_n")))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b.getAs[Long]("prev_n") === a.getAs[Long]("n"))
        val expected = (b.getAs[Long]("n") - b.getAs[Long]("prev_n")) *
          1000000L / b.getAs[Long]("prev_n")
        assert(b.getAs[Long]("delta_ppm") === expected)
      }
    }
  }

  test("q138: buckets cover every full-funnel user exactly once") {
    val out = Funnels.conversionLatency(spark, sf).collect()
    val nUsers = out.map(_.getAs[Long]("n_users")).sum
    val lastT = s"t${Funnels.FunnelSteps.size}"
    val full = Funnels.funnel(spark, sf).filter(col(lastT).isNotNull).count()
    assert(nUsers === full && full > 0)
    out.foreach(r => assert(r.getAs[Long]("bucket") >= 1))
  }

  test("q139: dedup accounting is internally consistent and covers every doc") {
    val out = MultiModal.mmDedup(spark, sf).collect()
    val items = out.map(_.getAs[Long]("n_items")).sum
    assert(items === graft.Tables.documents(spark, sf).count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_items") >= r.getAs[Long]("n_payloads"))
      assert(r.getAs[Long]("n_dup_items") ===
        r.getAs[Long]("n_items") - r.getAs[Long]("n_payloads"))
      assert(r.getAs[Long]("bytes_dedup") <= r.getAs[Long]("bytes_total"))
      val ppm = r.getAs[Long]("savings_ppm")
      assert(ppm >= 0 && ppm < 1000000L)
    }
  }

  test("q142: overlap pairs are symmetric-canonical, above threshold, and include a planted tail-edit pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = MultiModal.mmFrameOverlap(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("shared_blocks") >= MultiModal.MinSharedBlocks)
      assert(r.getAs[Long]("overlap_milli") >= 0 &&
        r.getAs[Long]("overlap_milli") <= 1000)
    }
    // mechanism check: two payloads identical in their first 128 bytes
    // (2 full 64B blocks) then diverging must pair; a fully distinct
    // payload must not
    // non-repeating prefix so the two leading 64B blocks have DISTINCT
    // digests (repeated content would collapse under the distinct())
    val base = (0 until 128).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq((1L, base + "tailA"), (2L, base + "tailB"),
      (3L, "9" * 200)).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val blocks = docs
      .select(col("doc_id"), col("payload"),
        expr(s"CAST(length(payload) AS BIGINT) DIV ${MultiModal.BlockBytes}").as("nb"))
      .filter(col("nb") >= 1)
      .select(col("doc_id"), col("payload"), col("nb"),
        explode(expr("sequence(0L, nb - 1L)")).as("bi"))
      .select(col("doc_id"),
        md5(col("payload").substr((col("bi") * MultiModal.BlockBytes + 1).cast("int"),
          lit(MultiModal.BlockBytes.toInt))).as("b"))
      .distinct()
    val pairs = blocks.as("x").join(blocks.as("y"),
        col("x.b") === col("y.b") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id"), col("y.doc_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 2L)), s"got $pairs")
  }
}
