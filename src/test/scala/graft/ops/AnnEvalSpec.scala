package graft.ops

import org.apache.spark.sql.Row
import graft.SparkTestBase

/** Behavior tests for the retrieval-evaluation batch: ANN recall audit
  * (q143), Matryoshka truncation audit (q144), and the token-coverage
  * curve (q145). q143/q144 are checked differentially against a
  * plain-Scala recomputation from the quantized vectors. */
class AnnEvalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def vecs(): Map[Long, Array[Long]] =
    Similarity.quantizedForTest(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Long](r.fieldIndex("q")).toArray).toMap

  private def cosMicro(a: Array[Long], b: Array[Long]): Long = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val n2a = a.map(x => x * x).sum
    val n2b = b.map(x => x * x).sum
    math.round(1e6 * dot / math.sqrt(n2a.toDouble * n2b.toDouble))
  }

  /** Exact top-k neighbor ids per query, the q33 ordering. */
  private def exactTopK(v: Map[Long, Array[Long]]): Map[Long, Seq[Long]] =
    v.keys.filter(_ < Similarity.NQueries).map { qid =>
      qid -> v.toSeq.filter(_._1 != qid)
        .map { case (id, q) => (id, cosMicro(v(qid), q)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(Similarity.TopK).map(_._1)
    }.toMap

  test("q143: exact side is always k deep; n_hit is the true intersection") {
    val out = Similarity.annRecall(spark, sf).collect()
    assert(out.nonEmpty)
    val ivf = Similarity.annIvf(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val exact = exactTopK(vecs())
    out.foreach { r =>
      val qid = r.getAs[Long]("q_id")
      assert(r.getAs[Long]("n_exact") === Similarity.TopK.toLong)
      val want = exact(qid).toSet.intersect(ivf.getOrElse(qid, Set.empty)).size
      assert(r.getAs[Long]("n_hit") === want.toLong)
      assert(r.getAs[Long]("recall_ppm") ===
        want * 1000000L / Similarity.TopK)
    }
    // the IVF index must be doing real work on this corpus: perfect
    // recall for at least one query, and never an empty result
    assert(out.exists(_.getAs[Long]("n_hit") > 0))
  }

  test("q144: overlap matches a plain-Scala full-vs-prefix ranking") {
    val v = vecs()
    val out = Similarity.matryoshkaOverlap(spark, sf).collect()
    assert(out.nonEmpty)
    def topBy(qid: Long, dims: Int): Seq[Long] =
      v.toSeq.filter(_._1 != qid).map { case (id, q) =>
        val (a, b) = (v(qid).take(dims), q.take(dims))
        val c = if (b.exists(_ != 0) && a.exists(_ != 0)) cosMicro(a, b) else 0L
        (id, c)
      }.sortBy { case (id, c) => (-c, id) }
        .take(Similarity.TopK).map(_._1)
    out.foreach { r =>
      val qid = r.getAs[Long]("q_id")
      assert(r.getAs[Long]("prefix_dim") === Similarity.PrefixDim.toLong)
      val full = topBy(qid, Int.MaxValue).toSet
      val pre = topBy(qid, Similarity.PrefixDim).toSet
      val want = full.intersect(pre).size.toLong
      assert(r.getAs[Long]("n_overlap") === want)
      assert(r.getAs[Long]("overlap_ppm") === want * 1000000L / Similarity.TopK)
    }
  }

  test("q145: curve is monotone, minimal, and exactly reproduces the census") {
    val out = TextAnalysis.tokenCoverage(spark, sf).collect()
    // every threshold emits a row — an unreachable one would carry
    // NULL vocab_size, never silently vanish
    assert(out.length === TextAnalysis.CoverageThresholdsPpm.size)
    // plain-Scala token census with the pinned tokenizer
    val counts = graft.Tables.documents(spark, sf)
      .select("text").collect().iterator
      .flatMap(_.getString(0).trim.split("[ \t\n\f\r]+"))
      .filter(_.nonEmpty).toSeq.groupBy(identity)
      .view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }
    val total = counts.map(_._2).sum
    val cums = counts.scanLeft(0L)(_ + _._2).tail
    out.foreach { r =>
      val thr = r.getAs[Long]("thr_ppm")
      val size = r.getAs[Long]("vocab_size").toInt
      assert(r.getAs[Long]("total_tokens") === total)
      assert(r.getAs[Long]("covered_tokens") === cums(size - 1))
      // reached the threshold, and size−1 would not have
      assert(cums(size - 1) * 1000000L >= thr * total)
      if (size > 1) assert(cums(size - 2) * 1000000L < thr * total)
    }
    val sizes = out.sortBy(_.getAs[Long]("thr_ppm")).map(_.getAs[Long]("vocab_size"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a <= b })
  }
}
