package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Differential tests for the search family (q69/q70): the inverted
  * index and the integer BM25 ranking must equal a plain-Scala
  * computation over the SAME tokenization — exact integer equality —
  * plus tokenizer edge cases on constructed documents (the oracles
  * only exercise the synthetic corpus, which has no pathological
  * whitespace). */
class SearchSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** The pinned whitespace contract: exactly these five separators. */
  private def refTokens(text: String): Seq[String] =
    text.trim.split("[ \t\n\f\r]+").toSeq.filter(_.nonEmpty)

  private lazy val corpus: Seq[(Long, String)] =
    graft.Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("q69 inverted index equals a plain-Scala posting build") {
    val postings: Map[String, Seq[(Long, Long)]] = corpus
      .flatMap { case (id, t) => refTokens(t).map(term => (term, id)) }
      .groupBy { case (term, id) => (term, id) }.view
      .mapValues(_.size.toLong).toSeq
      .map { case ((term, id), tf) => (term, id, tf) }
      .groupMap(_._1)(t => (t._2, t._3))
    val expected = postings.toSeq.sortBy(_._1).map { case (term, ps) =>
      val ids = ps.map(_._1)
      (term, ps.size.toLong, ps.map(_._2).sum, ids.min, ids.max,
        ids.sum, ids.reduce(_ ^ _))
    }
    val got = Search.invertedIndex(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q70 BM25 equals a plain-Scala integer BM25 over the same tokens") {
    val toks = corpus.map { case (id, t) => id -> refTokens(t) }
      .filter(_._2.nonEmpty).toMap
    val dl = toks.view.mapValues(_.size.toLong).toMap
    val nDocs = dl.size.toLong
    val tTokens = dl.values.sum
    val avgdl = tTokens / nDocs
    val tf: Map[(Long, String), Long] = toks.toSeq.flatMap { case (id, ws) =>
      ws.filter(Search.Bm25Terms.contains).map(w => (id, w))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df: Map[String, Long] = tf.keys.toSeq.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val scores: Map[Long, (Long, Long)] = tf.toSeq
      .map { case ((id, term), f) =>
        val idfPm = nDocs * 1000 / df(term)
        val denM = 1000 * f + 300 + (900 * dl(id)) / avgdl
        val satM = 2200000 * f / denM
        id -> (idfPm * satM)
      }
      .groupMapReduce(_._1)(t => (1L, t._2)) {
        case ((n1, s1), (n2, s2)) => (n1 + n2, s1 + s2)
      }
    val expected = scores.toSeq
      .map { case (id, (n, s)) => (id, n, s) }
      .sortBy { case (id, _, s) => (-s, id) }
      .take(Search.Bm25TopK)
    val got = Search.bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("tokenizer edge cases: empty, whitespace runs, single token, \\x0B") {
    val docs = Seq(
      (1L, ""), // empty → no tokens
      (2L, "   \t\n  "), // whitespace only → no tokens
      (3L, "solo"), // single token
      (4L, "  a  \t b\n\nc "), // runs of mixed separators
      (5L, "x\u000by"), // vertical tab is NOT a separator (pinned class)
      (6L, "dup dup dup") // tf > 1
    ).toDF("doc_id", "text")
    val got = Search.tokens(docs)
      .groupBy("doc_id").agg(collect_list("term").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(!got.contains(1L) && !got.contains(2L))
    assert(got(3L) == Seq("solo"))
    assert(got(4L).sorted == Seq("a", "b", "c"))
    assert(got(5L) == Seq("x\u000by"), "\\x0B must stay inside the token")
    assert(got(6L) == Seq("dup", "dup", "dup"))
    // and the plain-Scala reference agrees on every case
    Seq("", "   \t\n  ", "solo", "  a  \t b\n\nc ", "x\u000by", "dup dup dup")
      .zipWithIndex.foreach { case (t, i) =>
        val id = (i + 1).toLong
        assert(refTokens(t) == got.getOrElse(id, Seq.empty),
          s"scala/spark tokenizer divergence on doc $id")
      }
  }
}
