package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior tests for the warehouse-ops batch: dedup savings (q130),
  * latest-wins compaction (q131), top-N+OTHER (q132), equi-width
  * histogram (q133), and common-neighbors link prediction (q134). */
class WarehouseOpsSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q130: savings accounting is internally consistent and covers every doc") {
    val out = Dedup.dedupSavings(spark, sf).collect()
    val nDocs = out.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === graft.Tables.documents(spark, sf).count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped")
        === r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("chars_kept") <= r.getAs[Long]("chars_total"))
      val ppm = r.getAs[Long]("savings_ppm")
      assert(ppm >= 0 && ppm < 1000000L)
    }
    // n_dropped must equal the non-canonical count from q91 directly
    val dropped = Dedup.erCanonical(spark, sf)
      .filter(col("is_canonical") === 0L).count()
    assert(out.map(_.getAs[Long]("n_dropped")).sum === dropped)
  }

  test("q131: exactly one row per user, and it is that user's event-time maximum") {
    val out = Scd.latestCompaction(spark, sf)
    val users = graft.Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.count() === users)
    val maxUs = graft.Tables.events(spark, sf)
      .groupBy("user_id").agg(max(unix_micros(col("ts"))).as("mx"))
    val bad = out.join(maxUs, "user_id").filter(col("us") =!= col("mx")).count()
    assert(bad === 0L, "compacted row must carry the user's max event time")
  }

  test("q132: OTHER absorbs exactly the tail and totals are preserved") {
    val out = Relational.topNOther(spark, sf).collect()
    assert(out.length <= Relational.TopNOther + 1)
    val full = Relational.q03RevenueByNation(spark, sf)
      .groupBy().agg(sum("revenue_cents").cast("long"), sum("n_orders").cast("long"))
      .collect()(0)
    assert(out.map(_.getAs[Long]("revenue_cents")).sum === full.getLong(0))
    assert(out.map(_.getAs[Long]("n_orders")).sum === full.getLong(1))
    // named buckets each out-earn OTHER's largest constituent? At
    // minimum: every named bucket beats the smallest named bucket.
    val named = out.filter(_.getAs[String]("bucket") != "OTHER")
    assert(named.length <= Relational.TopNOther)
  }

  test("q133: bins partition the value range; every count lands in its bounds") {
    val out = DataPrep.equiWidthHist(spark, sf).collect()
    val n = out.map(_.getAs[Long]("n")).sum
    assert(n === graft.Tables.events(spark, sf).count())
    out.foreach { r =>
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
      val b = r.getAs[Long]("bin")
      assert(b >= 0 && b < DataPrep.HistBins)
    }
    // bounds tile without overlap in bin order
    val sorted = out.sortBy(_.getAs[Long]("bin"))
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      if (b.getAs[Long]("bin") === a.getAs[Long]("bin") + 1)
        assert(b.getAs[Long]("lo_cents") === a.getAs[Long]("hi_cents") + 1)
    }
  }

  test("q134: predicted pairs are never existing edges and scores are true wedge counts") {
    val out = Graphs.linkPrediction(spark, sf).collect()
    assert(out.nonEmpty && out.length <= Graphs.LinkTopK)
    val cns = out.map(_.getAs[Long]("common_neighbors"))
    assert(cns.zip(cns.tail).forall { case (a, b) => a >= b })
    // hand-check on a triangle-plus-pendant graph: edges 1-2,2-3,1-3,3-4
    // → non-adjacent pairs with common neighbors: (1,4) via 3, (2,4) via 3
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val adj = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val wedges = adj.select(col("src").as("n"), col("dst").as("x"))
      .join(adj.select(col("src").as("n"), col("dst").as("y")), Seq("n"))
      .filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("cn"))
    val pred = wedges.join(e, wedges("x") === e("a") && wedges("y") === e("b"),
        "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pred === Set((1L, 4L, 1L), (2L, 4L, 1L)))
  }
}
