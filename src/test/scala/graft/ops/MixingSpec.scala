package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.graftbridge.Md5PrefixLong
import graft.SparkTestBase

/** Differential tests for dataset mixing (q73): copy counts, mixture
  * composition, and interleave keys must equal a plain-Scala replay of
  * the same hash arithmetic. */
class MixingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def h8(s: String): Long =
    Md5PrefixLong.prefix(s.getBytes(StandardCharsets.UTF_8), 8)

  private lazy val docs: Seq[(Long, String)] =
    graft.Tables.documents(spark, dir).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def refCopies(docId: Long, source: String): Long = {
    val w = Mixing.MixWeights.toMap.getOrElse(source, 0L)
    w / 1000 + (if (h8(s"mix:$docId") % 1000 < w % 1000) 1L else 0L)
  }

  test("q73 rows equal the plain-Scala expansion, in order") {
    val expected = docs.sortBy(_._1).flatMap { case (id, src) =>
      val w = Mixing.MixWeights.toMap.getOrElse(src, 0L)
      (1L to refCopies(id, src)).map { c =>
        (id, c, src, w, h8(s"ord:$id:$c") % Mixing.OrdBuckets)
      }
    }
    val got = Mixing.mixture(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("mixture composition matches the declared weights in expectation") {
    val bySource = docs.groupBy(_._2).view
      .mapValues(ds => ds.map { case (id, src) => refCopies(id, src) }.sum)
    // every source with weight ≥ 1000 emits at least one copy per doc;
    // expected totals are docs·w/1000 — check the integer floor/ceil
    // envelope (the fractional copy is hash-selected per doc)
    bySource.foreach { case (src, total) =>
      val w = Mixing.MixWeights.toMap.getOrElse(src, 0L)
      val nDocs = docs.count(_._2 == src).toLong
      assert(total >= nDocs * (w / 1000), s"$src under floor")
      assert(total <= nDocs * (w / 1000 + (if (w % 1000 > 0) 1 else 0)),
        s"$src over ceil")
    }
    // up-sampled sources must actually exceed one copy per doc
    val up = Mixing.MixWeights.filter(_._2 > 1000).map(_._1).toSet
    assert(up.forall(src => docs.exists(_._2 == src) ==>
      (bySource(src) > docs.count(_._2 == src))), "no up-sampling observed")
  }

  test("q105 scores equal a plain-Scala replay of the hashed-bucket model") {
    val full = graft.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def buckets(t: String): Seq[Long] =
      t.trim.split("[ \t\n\f\r]+").toSeq.filter(_.nonEmpty)
        .map(w => h8(w) % Mixing.DsirBuckets)
    val tgt = Mixing.dsirTargetSources.toSet
    val toks = full.flatMap { case (_, src, t) => buckets(t).map((src, _)) }
    val cAll = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cTgt = toks.filter(p => tgt(p._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val tAll = cAll.values.sum
    val tTgt = cTgt.values.sum
    // both quotients non-negative, so Scala / matches Spark div
    def delta(b: Long): Long =
      cTgt.getOrElse(b, 0L) * 1000000L / tTgt - cAll(b) * 1000000L / tAll
    val expected = full.sortBy(_._1).map { case (id, src, t) =>
      val bs = buckets(t)
      val ss = bs.map(delta).sum
      (id, src, bs.size.toLong, ss, if (ss > 0) 1L else 0L)
    }.toSeq
    val got = Mixing.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    // the selector must bind: both kept and dropped docs exist
    assert(got.exists(_._5 == 1L) && got.exists(_._5 == 0L))
  }

  private implicit class BoolOps(a: Boolean) {
    def ==>(b: => Boolean): Boolean = !a || b
  }
}
