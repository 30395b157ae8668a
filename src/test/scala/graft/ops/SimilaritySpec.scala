package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Behavioral tests of the ANN family on constructed vectors with known
  * geometry. */
class SimilaritySpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 64

  private def vec(f: Int => Float): Seq[Float] = (0 until dim).map(f)

  /** vec 0 = e0; vec 20 = 2·e0 (cos 1 with the query); vec 21 = −e0;
    * vec 22 = e1 (orthogonal); the rest form a deterministic cloud. */
  private lazy val dir: String = {
    val d = tmpDir("emb")
    val rows = Seq(
      (0L, vec(j => if (j == 0) 1f else 0f), 0),
      (20L, vec(j => if (j == 0) 2f else 0f), 0),
      (21L, vec(j => if (j == 0) -1f else 0f), 0),
      (22L, vec(j => if (j == 1) 1f else 0f), 1)
    ) ++ (23L to 80L).map { i =>
      (i, vec(j => (((i * 31 + j * 7) % 13) - 6).toFloat / 6f), (i % 10).toInt)
    }
    rows.toDF("vec_id", "embedding", "label").write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q33 brute force ranks the parallel vector first with cos_micro = 1e6") {
    val top = Similarity.annBruteForce(spark, dir)
      .filter(col("q_id") === 0 && col("rnk") === 1).head()
    assert(top.getAs[Long]("vec_id") === 20L)
    assert(top.getAs[Long]("cos_micro") === 1000000L)
  }

  test("q33 antiparallel vector ranks last for the axis query") {
    val rows = Similarity.annBruteForce(spark, dir)
      .filter(col("q_id") === 0).orderBy(col("rnk"))
      .select("vec_id", "cos_micro").collect()
    assert(rows.length === 10)
    // strictly non-increasing scores
    val scores = rows.map(_.getLong(1)).toSeq
    assert(scores === scores.sorted.reverse)
    assert(!rows.map(_.getLong(0)).contains(21L)) // cos −1 can't be top-10 here
  }

  test("q34 IVF results are a subset of brute-force candidates with exact scores") {
    val bf = Similarity.annBruteForce(spark, dir)
      .select("q_id", "vec_id", "cos_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ivf = Similarity.annIvf(spark, dir)
      .select("q_id", "vec_id", "cos_micro").collect()
    assert(ivf.nonEmpty)
    // every IVF hit that brute force also surfaced carries the SAME score
    ivf.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1))).foreach(s => assert(s === r.getLong(2)))
    }
    // ranks are 1..k dense per query
    val perQ = ivf.groupBy(_.getLong(0))
    Similarity.annIvf(spark, dir).groupBy("q_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx")).collect()
      .foreach(r => assert(r.getAs[Long]("n") === r.getAs[Long]("mx")))
    assert(perQ.nonEmpty)
  }

  test("q111 hard negatives exclude every same-label vector and keep exact scores") {
    val hn = Similarity.hardNegatives(spark, dir)
      .select("q_id", "q_label", "rnk", "vec_id", "neg_label", "cos_micro").collect()
    assert(hn.nonEmpty)
    // the defining property: no returned negative shares the query's label
    hn.foreach(r => assert(r.getLong(4) !== r.getLong(1)))
    // query 0 has label 0 — its same-label parallel (20) and
    // antiparallel (21) vectors must never surface, however close
    val q0 = hn.filter(_.getLong(0) == 0L).map(_.getLong(3)).toSet
    assert(!q0.contains(20L) && !q0.contains(21L))
    // scores are the exact cosines: any pair the label-blind IVF probe
    // (same buckets) also surfaced carries the identical cos_micro
    val ivf = Similarity.annIvf(spark, dir)
      .select("q_id", "vec_id", "cos_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    hn.foreach { r =>
      ivf.get((r.getLong(0), r.getLong(3))).foreach(s => assert(s === r.getLong(5)))
    }
    // ranks dense 1..n per query
    hn.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq === (1L to rs.length).toSeq)
    }
  }

  test("q57 PQ reranks with exact scores and finds the parallel vector for the axis query") {
    val bf = Similarity.annBruteForce(spark, dir)
      .select("q_id", "vec_id", "cos_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pq = Similarity.annPq(spark, dir)
      .select("q_id", "rnk", "vec_id", "cos_micro").collect()
    assert(pq.nonEmpty)
    // the rerank is exact: every surfaced pair carries the brute-force
    // cosine, never an ADC approximation
    pq.foreach { r =>
      assert(bf((r.getLong(0), r.getLong(2))) === r.getLong(3))
      assert(r.getLong(0) !== r.getLong(2), "self never returned")
    }
    // vec 20 (parallel to query 0) survives quantization + ADC: its
    // codes equal the query's codes, so ADC distance is minimal and
    // the exact rerank puts it first
    val q0top = pq.filter(r => r.getLong(0) == 0L && r.getLong(1) == 1L).head
    assert(q0top.getLong(2) === 20L && q0top.getLong(3) === 1000000L)
    // ranks dense 1..n per query
    pq.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq)
    }
  }

  test("q58 IVF∘PQ: exact scores, self excluded, candidates within probed buckets") {
    val bf = Similarity.annBruteForce(spark, dir)
      .select("q_id", "vec_id", "cos_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ivf = Similarity.annIvf(spark, dir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.annIvfPq(spark, dir)
      .select("q_id", "rnk", "vec_id", "cos_micro").collect()
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { r =>
      assert(bf((r.getLong(0), r.getLong(2))) === r.getLong(3),
        "rerank scores are the exact cosines")
      assert(r.getLong(0) !== r.getLong(2))
    }
    // IVF returns the exact top-k of the probed buckets; IVF∘PQ ranks
    // the same bucket population through the ADC shortlist, so any
    // composed hit that IVF also kept must carry the same exact score
    // (subset is not required — ADC may shortlist bucket members that
    // exact-IVF's top-k cut — but disjoint results would mean the
    // bucket scoping is broken)
    val composedPairs = ivfpq.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(composedPairs.intersect(ivf).nonEmpty,
      "composed results must overlap the IVF top-k of the same buckets")
  }

  test("q72 residual IVF-PQ: exact scores, self excluded, recall not below raw-PQ composition") {
    val bf = Similarity.annBruteForce(spark, dir)
      .select("q_id", "rnk", "vec_id", "cos_micro").collect()
    val bfScores = bf.map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val got = Similarity.annIvfPqResidual(spark, dir)
      .select("q_id", "rnk", "vec_id", "cos_micro").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(bfScores((r.getLong(0), r.getLong(2))) === r.getLong(3),
        "rerank scores are the exact cosines")
      assert(r.getLong(0) !== r.getLong(2), "self never returned")
      // parallel vector survives: its residual equals the query's
      // residual in the shared cell, so ADC keeps it for the rerank
    }
    val q0top = got.filter(r => r.getLong(0) == 0L && r.getLong(1) == 1L).head
    assert(q0top.getLong(2) === 20L && q0top.getLong(3) === 1000000L)
    // recall@10 vs brute-force ground truth: residual quantization must
    // not degrade the composition below the raw-vector q58 variant on
    // the same cells/probes (it centers codebook resolution, so ≥)
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val truth = bf.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      val byQ = rows.groupBy(_.getLong(0))
      val rs = truth.keys.toSeq.map { q =>
        val hit = byQ.getOrElse(q, Array.empty)
          .map(_.getLong(2)).toSet.intersect(truth(q)).size
        hit.toDouble / truth(q).size
      }
      rs.sum / rs.size
    }
    val raw = Similarity.annIvfPq(spark, dir)
      .select("q_id", "rnk", "vec_id", "cos_micro").collect()
    assert(recall(got) >= recall(raw) - 1e-9,
      s"residual recall ${recall(got)} below raw-PQ recall ${recall(raw)}")
  }

  test("q59 k-means matches a plain-Scala Lloyd reference exactly") {
    // replicate: quantize, hash-pick K seeds, KmIters rounds of
    // assign (L2, tie → min k) + floor-mean update, final assign
    val vecs = Similarity.quantizedForTest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def h8(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cent: Seq[(Long, Array[Long])] = vecs.toSeq
      .sortBy { case (id, _) => (h8(id.toString), id) }
      .take(Similarity.KmK).zipWithIndex
      .map { case ((_, q), k) => (k.toLong, q) }
    def assign(): Map[Long, (Long, Long)] = vecs.map { case (id, q) =>
      val (k, d) = cent.map { case (k, cq) => (k, l2(q, cq)) }
        .minBy { case (k, d) => (d, k) }
      id -> (k, d)
    }
    (1 to Similarity.KmIters).foreach { _ =>
      val byK = assign().toSeq.groupBy(_._2._1)
      cent = cent.map { case (k, old) =>
        byK.get(k).fold((k, old)) { members =>
          val qs = members.map(m => vecs(m._1))
          (k, (0 until 64).map(j =>
            math.floor(qs.map(_(j)).sum.toDouble / qs.length).toLong).toArray)
        }
      }
    }
    val want = assign()
    val got = Similarity.kmeansResult(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want, "Spark Lloyd must equal the Scala reference run")
    assert(got.values.map(_._1).toSet.subsetOf((0L until Similarity.KmK).toSet))
  }

  test("q93 SemDeDup matches a plain-Scala reference (rep choice + cosine flags)") {
    val vecs = Similarity.quantizedForTest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // the clustering itself is pinned by the q59 differential above;
    // here reuse the engine's assignment and verify the SemDeDup layer
    val assigned = Similarity.kmeansResult(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val rep = assigned.groupBy(_._2).map { case (k, ms) =>
      k -> ms.minBy(m => (m._3, m._1))._1
    }
    val want = assigned.map { case (id, k, _) =>
      val r = rep(k)
      val cos = math.round(1e6 * dot(vecs(id), vecs(r)) /
        math.sqrt(dot(vecs(id), vecs(id)).toDouble * dot(vecs(r), vecs(r))))
      (id, k, r, cos, if (id != r && cos >= Similarity.SemDupMicroMin) 1L else 0L)
    }.toSet
    val got = Similarity.semDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === want, "SemDeDup layer must equal the Scala reference")
    // every cluster keeps exactly one representative (is_dup=0, self)
    val reps = got.filter(t => t._1 == t._3)
    assert(reps.map(_._2).toSet === got.map(_._2).toSet)
    assert(reps.forall(_._5 == 0L))
  }

  test("q35 LSH near-dup finds the parallel pair (identical hyperplane signs)") {
    val pairs = Similarity.embNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (0, 20) are parallel → same bucket in EVERY table, cos_micro 1e6
    assert(pairs.exists(p => p._1 == 0L && p._2 == 20L && p._3 == 1000000L))
    // antiparallel pair never surfaces (opposite sign bits everywhere)
    assert(!pairs.exists(p => p._1 == 0L && p._2 == 21L))
    assert(!pairs.exists(p => p._1 == 20L && p._2 == 21L))
  }

  test("kCentroidsFor: floor at harness scales, √N growth, hard cap") {
    // every harness SF (N ≤ 2000) stays at the round-2 constant 16
    assert(Similarity.kCentroidsFor(500) === 16)
    assert(Similarity.kCentroidsFor(2000) === 16)
    assert(Similarity.kCentroidsFor(17000) === 16)
    // past the floor it grows as √(N/64)
    assert(Similarity.kCentroidsFor(1L << 20) === 128)
    assert(Similarity.kCentroidsFor(1L << 26) === 1024)
    // monotone, capped
    assert(Similarity.kCentroidsFor(1L << 40) <= Similarity.KCentroidsCap)
    assert(Similarity.kCentroidsFor(1L << 50) === Similarity.KCentroidsCap)
  }

  test("quantized cosine is symmetric and bounded") {
    val pairs = Similarity.embNearDup(spark, dir).collect()
    pairs.foreach { r =>
      val c = r.getAs[Long]("cos_micro")
      assert(c >= Similarity.NearDupMicroMin && c <= 1000000L)
    }
  }

  test("q182: component matches an exact BigInt power-iteration replay") {
    val out = Similarity.powerIteration(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("component_ppm")).toMap
    assert(out.size === dim)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(_.getSeq[Float](1)
        .map(x => BigInt(math.round(x.toDouble * Similarity.QScale))).toArray)
    val n = BigInt(vecs.length)
    val s = Array.tabulate(dim)(i => vecs.map(_(i)).sum)
    val c = Array.tabulate(dim, dim) { (i, j) =>
      n * vecs.map(v => v(i) * v(j)).sum - s(i) * s(j)
    }
    var x = Array.fill(dim)(BigInt(1000000))
    (1 to Similarity.PowIters).foreach { _ =>
      val y = Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * x(j)).sum)
      val my = y.map(_.abs).max.max(BigInt(1))
      x = y.map(v => v * 1000000 / my)
    }
    (0 until dim).foreach { d =>
      assert(out(d.toLong) === x(d).toLong, s"dim $d")
    }
    // max-normalization: some dimension sits at ±1e6 exactly
    assert(out.values.map(math.abs).max === 1000000L)
  }

  test("q173: per-dim stats match an exact BigInt replay of the quantized frame") {
    val out = Similarity.embeddingStats(spark, dir).collect()
    assert(out.length === dim)
    val q = Similarity.quantizedForTest(spark, dir)
      .collect().map(_.getSeq[Long](1))
    // embeddingStats censuses ALL vectors (no n2>0 filter); replay raw
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(_.getSeq[Float](1)
        .map(x => math.round(x.toDouble * Similarity.QScale)))
    out.foreach { r =>
      val d = r.getAs[Long]("dim").toInt
      val vs = raw.map(_(d))
      val n = BigInt(vs.length)
      val sv = vs.map(BigInt(_)).sum
      val s2 = vs.map(v => BigInt(v) * v).sum
      assert(r.getAs[Long]("n_vecs") === vs.length.toLong)
      // BigInt / truncates toward zero, same as Spark div / DuckDB //
      assert(r.getAs[Long]("mean_milli") === (sv / n).toLong, s"dim $d mean")
      val varNum = n * s2 - sv * sv
      assert(r.getAs[Long]("std_milli") ===
        math.round(math.sqrt(varNum.toDouble) / n.toDouble), s"dim $d std")
    }
    assert(q.nonEmpty) // the quantized frame exists and is non-empty
  }
}
