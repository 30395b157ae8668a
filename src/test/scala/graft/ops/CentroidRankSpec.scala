package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential pin of [[Similarity.centroidRanks]]: the scalar-
  * expression ranking (transform → array_sort → posexplode) must
  * reproduce, row for row, the window formulation it replaced
  * (crossJoin + row_number over (ccos desc, cid asc)) — including
  * tie-breaks, which the generated data forces deliberately via
  * duplicated centroid vectors (equal ccos ⇒ rank order decided by
  * cid alone). Seeded pseudo-random vectors, no RNG object — rows are
  * a pure function of (i, j). */
class CentroidRankSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 8

  private def q(i: Long): Seq[Long] =
    (0 until dim).map(j => ((i * 37 + j * 11) % 19) - 9)

  /** 60 vectors; extra columns (label) to pin column pass-through. */
  private lazy val vecs: DataFrame = {
    val rows = (0L until 60L).map { i =>
      val v = q(i)
      (i, v, v.map(x => x * x).sum, (i % 3).toInt)
    }
    rows.toDF("vec_id", "q", "n2", "label")
  }

  /** 7 centroids, of which cids 101/102 and 103/104 are DUPLICATE
    * vectors — every vector ties on ccos there, so ranks 1..7 are only
    * correct if the cid tie-break matches the window's. */
  private lazy val cents: DataFrame = {
    val base = Seq(0L, 1L, 1L, 2L, 2L, 3L, 4L)
    base.zipWithIndex.map { case (seed, idx) =>
      val v = q(1000L + seed)
      (100L + idx, v, v.map(x => x * x).sum)
    }.toDF("cid", "cq", "cn2")
  }

  /** The formulation centroidRanks replaced, verbatim. */
  private def windowRanks(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
    vecs.crossJoin(broadcast(cent))
      .select(vecs.columns.map(col).toSeq :+ col("cid") :+
        Similarity.cosMicro(
          graft.functions.ArrayFunctions.dotProductLong(col("q"), col("cq")),
          col("n2"), col("cn2")).as("ccos"): _*)
      .withColumn("crn", row_number().over(w))
  }

  test("scalar-expression ranking ≡ window ranking, ties included") {
    val got = Similarity.centroidRanks(vecs, cents)
      .select("vec_id", "label", "cid", "ccos", "crn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getAs[Number](4).intValue())).toSet
    val want = windowRanks(vecs, cents)
      .select("vec_id", "label", "cid", "ccos", "crn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getAs[Number](4).intValue())).toSet
    assert(got.size === 60 * 7)
    assert(got === want)
  }

  test("duplicate centroids really tie and rank by cid") {
    val r = Similarity.centroidRanks(vecs, cents)
      .filter(col("vec_id") === 5L).orderBy("crn")
      .select("cid", "ccos").collect()
    val byCid = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(byCid(101L) === byCid(102L), "cids 101/102 share a vector")
    val pos = r.map(_.getLong(0)).toSeq
    assert(pos.indexOf(101L) === pos.indexOf(102L) - 1,
      s"tied centroids must order by cid, got $pos")
  }
}
