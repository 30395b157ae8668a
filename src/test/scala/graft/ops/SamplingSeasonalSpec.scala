package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior tests for the sampling/seasonality batch: systematic PPS
  * sampling (q122), day-of-week seasonality (q123), MAD outliers
  * (q124), and the nearest-centroid confusion matrix (q125). */
class SamplingSeasonalSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q122: sample size is capped at target+1, every step-spanning doc is in, re-runs agree") {
    val out = DataPrep.ppsSample(spark, sf)
    val bySource = out.groupBy("source").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a doc spanning k multiples of step collapses k picks into one,
    // so the count can only fall BELOW target; the cap is target+1
    bySource.values.foreach { k =>
      assert(k >= 1 && k <= DataPrep.PpsPerSource + 1,
        s"per-source sample $k above cap ${DataPrep.PpsPerSource + 1}")
    }
    // sharp inclusion bound: w ≥ step forces a crossing → selected
    val d = graft.Tables.documents(spark, sf)
      .filter(col("n_chars") > 0)
      .groupBy("source")
      .agg(count(lit(1)).as("nd"), sum("n_chars").as("tw"))
      .withColumn("step",
        greatest(expr(s"tw div ${DataPrep.PpsPerSource}"), lit(1L)))
      .select("source", "step")
    val mustHave = graft.Tables.documents(spark, sf)
      .join(d, "source")
      .filter(col("n_chars") >= col("step"))
      .select("doc_id")
    val missed = mustHave.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
    assert(missed.count() === 0L, "a step-spanning doc must always be sampled")
    val again = DataPrep.ppsSample(spark, sf).collect().map(_.toString).sorted
    assert(again.sameElements(out.collect().map(_.toString).sorted))
  }

  test("q122: zero-length documents are never selected") {
    assert(DataPrep.ppsSample(spark, sf).filter(col("w") <= 0).count() === 0L)
  }

  test("q123: seasonal indices are mass-weighted around 1000 milli") {
    val out = Funnels.dowSeasonality(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("dow")).toSet.subsetOf((0L to 6L).toSet))
      // Σ n_dow·index ≈ 1000·n_type (exact up to the two truncations)
      val n = rows.map(_.getAs[Long]("n")).sum
      val weighted = rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("index_milli")).sum
      assert(math.abs(weighted - 1000L * n) <= 2L * n,
        s"weighted index $weighted vs ${1000L * n}")
    }
  }

  test("q124: MAD flags a planted far outlier and nothing in a tight cluster") {
    // tight cluster 100±1 plus one wild point: med=100, mad=1,
    // only the wild point exceeds 3·mad
    val e = (Seq.fill(10)(100L) ++ Seq(99L, 101L, 100000L)).zipWithIndex
      .map { case (c, i) => ("a", c, i) }
      .toDF("event_type", "cents", "i")
    val gw = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("cents").asc_nulls_last)
    val med = e.withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(gw))
      .groupBy("event_type")
      .agg(max(when(col("r") === expr("(n + 1) div 2"), col("cents"))).as("med"))
      .collect()(0).getLong(1)
    assert(med === 100L)
    val real = Quality.madOutliers(spark, sf).collect()
    real.foreach { r =>
      assert(r.getAs[Long]("mad_cents") >= 0)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("max_ad") >=
        r.getAs[Long]("mad_cents"), "max deviation below the MAD is impossible")
    }
  }

  test("q125: confusion cells partition the vectors; diagonal dominates a labeled space") {
    val out = Similarity.centroidConfusion(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n")).sum
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    assert(total === nVecs, "every vector is assigned exactly once")
    val diag = out.filter(r =>
      r.getAs[Long]("label") === r.getAs[Long]("pred_label"))
      .map(_.getAs[Long]("n")).sum
    // synthetic labeled clusters: the diagonal should beat chance
    assert(diag * 5 > total, s"diagonal $diag of $total is below 20%")
  }
}
