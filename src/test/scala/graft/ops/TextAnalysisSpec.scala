package graft.ops

import graft.SparkTestBase

/** Differential test for the co-occurrence pass (q75): the capped-vocab
  * PMI/lift table must equal a plain-Scala pair count over the SAME
  * tokenization and the SAME ranking, on the real sf0.001 corpus (the
  * oracle harness proves engine parity at sf0.01; this proves the
  * semantics against an independent in-memory implementation). */
class TextAnalysisSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def refTokens(text: String): Seq[String] =
    text.trim.split("[ \t\n\f\r]+").toSeq.filter(_.nonEmpty)

  test("q75 PMI pairs equal a plain-Scala co-occurrence build") {
    val corpus = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val nDocs = corpus.size.toLong
    val docToks: Seq[(Long, Seq[String])] =
      corpus.map { case (id, t) => id -> refTokens(t).distinct }
    val df: Map[String, Long] = docToks.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab: Set[String] = df.toSeq
      .sortBy { case (tok, d) => (-d, tok) }.take(TextAnalysis.PmiVocab)
      .map(_._1).toSet
    val cab: Map[(String, String), Long] = docToks
      .flatMap { case (_, ts) =>
        val v = ts.filter(vocab).sorted
        for (i <- v.indices; j <- (i + 1) until v.size) yield (v(i), v(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = cab.toSeq.map { case ((a, b), c) =>
      val lift = math.round(1000000.0 * c * nDocs / (df(a) * df(b)))
      (a, b, c, df(a), df(b), lift)
    }.sortBy { case (a, b, c, _, _, _) => (-c, a, b) }.take(100)
    val got = TextAnalysis.pmiPairs(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q77 bigram LM equals a plain-Scala bigram count build") {
    val corpus = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val cab: Map[(String, String), Long] = corpus
      .flatMap { case (_, t) =>
        val ts = refTokens(t)
        ts.zip(ts.drop(1))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca: Map[String, Long] = cab.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val expected = cab.toSeq.map { case ((a, b), c) =>
      (a, b, c, ca(a), c * 1000000L / ca(a))
    }.sortBy { case (a, b, c, _, _) => (-c, a, b) }.take(100)
    val got = TextAnalysis.bigramLm(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q89 vocab growth equals a plain-Scala first-occurrence curve") {
    val corpus = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val first = scala.collection.mutable.Map.empty[String, Long]
    corpus.sortBy(_._1).foreach { case (id, t) =>
      t.trim.split("\\s+").filter(_.nonEmpty).distinct.foreach { w =>
        if (!first.contains(w)) first(w) = id
      }
    }
    val newPerBucket = first.values.groupBy(_ / TextAnalysis.VocabBucket)
      .view.mapValues(_.size.toLong).toMap
    val buckets = newPerBucket.keys.toSeq.sorted
    var cum = 0L
    val expected = buckets.map { b =>
      cum += newPerBucket(b); (b, newPerBucket(b), cum)
    }
    val got = TextAnalysis.vocabGrowth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.last._3 === first.size.toLong)
  }
}
