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

  /** Plain-Scala reference BPE trainer: returns the merge table and
    * the final per-word symbol sequences. Greedy left-to-right merge —
    * an independent list implementation of the string-replace kernel. */
  private def refBpe(corpus: Seq[String])
      : (Seq[(Long, String, String, Long, String)], Map[String, List[String]]) = {
    val freq: Map[String, Long] = corpus
      .flatMap(refTokens).filter(_.matches("[a-z0-9]+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def applyMerge(syms: List[String], a: String, b: String): List[String] =
      syms match {
        case x :: y :: rest if x == a && y == b =>
          (a + b) :: applyMerge(rest, a, b)
        case x :: rest => x :: applyMerge(rest, a, b)
        case Nil => Nil
      }
    var wordSyms: Map[String, List[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toList).toMap
    val merges = (1 to TextAnalysis.BpeRounds).flatMap { r =>
      val counts = wordSyms.toSeq.flatMap { case (w, syms) =>
        syms.zip(syms.drop(1)).map(p => p -> freq(w))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) None
      else {
        val ((a, b), cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        wordSyms = wordSyms.view
          .mapValues(applyMerge(_, a, b)).toMap
        Some((r.toLong, a, b, cnt, a + b))
      }
    }
    (merges, wordSyms)
  }

  test("q95 BPE merges equal a plain-Scala greedy merge loop") {
    val corpus = graft.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0)).toSeq
    val (expected, _) = refBpe(corpus)
    val got = TextAnalysis.bpeMerges(spark, dir).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got === expected)
  }

  test("q96 tokenize-with-trained-BPE equals the reference encoder") {
    val corpus = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (_, wordSyms) = refBpe(corpus.map(_._2))
    val expected = corpus.map { case (id, t) =>
      val ts = refTokens(t)
      val nBpe = ts.map(w =>
        wordSyms.get(w).map(_.size.toLong).getOrElse(w.length.toLong)).sum
      val chars = ts.map(_.length.toLong).sum
      (id, ts.size.toLong, nBpe,
        if (chars == 0) 0L else nBpe * 1000 / chars)
    }.sortBy(_._1)
    val got = TextAnalysis.bpeTokenize(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // in-vocab words cost ≤ their length; the encoder can only shrink
    got.zip(expected).foreach { case (g, _) =>
      assert(g._3 <= corpus.find(_._1 == g._1).get._2.length) }
  }

  test("q98 LM fluency scores equal a plain-Scala bigram-LM replay") {
    val corpus = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // q77-style tokenization: split includes empty tokens like Spark
    def ts(t: String): Seq[String] = t.trim.split("[ \t\n\f\r]+").toSeq
    val allBi = corpus.flatMap { case (id, t) =>
      val s = ts(t); s.zip(s.drop(1)).map(p => (id, p))
    }
    val cab = allBi.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ca = cab.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val expected = corpus.map { case (id, t) =>
      val s = ts(t)
      val bs = s.zip(s.drop(1))
      val n = bs.size.toLong
      val mean =
        if (n == 0) 0L
        else bs.map(p => cab(p) * 1000000L / ca(p._1)).sum / n
      (id, n, mean, if (mean >= TextAnalysis.LmKeepPpmMin) 1L else 0L)
    }.sortBy(_._1)
    val got = TextAnalysis.lmFluency(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.exists(_._4 == 1L) && got.exists(_._4 == 0L),
      "threshold must split the corpus")
  }

  test("q95 BPE merges consume earlier merges and scan greedily left-to-right") {
    import spark.implicits._
    // "aaab"×3 + "aab"×2: round 1 merges (a,a) GREEDILY — "aaab" must
    // pair as [aa][a][b], never [a][aa][b]; round 2's top pair is then
    // (aa,a) — a merge consuming round 1's output symbol
    val d = tmpDir("bpe")
    Seq((1L, "aaab aaab aaab aab aab", "en", "s", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextAnalysis.bpeMerges(spark, d).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq
    // freq: aaab×3, aab×2. r1 adjacent-pair counts (overlapping, the
    // Sennrich count): (a,a) = 2·3 + 1·2 = 8, (a,b) = 3 + 2 = 5 → (a,a).
    assert(got.head === ((1L, "a", "a", 8L, "aa")))
    // applying (a,a) GREEDILY: aaab → [aa,a,b] (never [a,aa,b]),
    // aab → [aa,b]. r2 counts: (aa,a) 3, (a,b) 3, (aa,b) 2 — tied on
    // count, ORDER BY (cnt DESC, a, b) → a="a" < "aa" → (a,b).
    assert(got(1) === ((2L, "a", "b", 3L, "ab")))
    // after r2: [aa,ab]×3, [aa,b]×2. r3: (aa,ab) 3 > (aa,b) 2 →
    // (aa,ab) — a merge consuming BOTH earlier rounds' outputs.
    assert(got(2) === ((3L, "aa", "ab", 3L, "aaab")))
    assert(got(3) === ((4L, "aa", "b", 2L, "aab")))
    // r5: every word is one symbol — no pairs left; the merge table
    // simply ends (rounds 5 and 6 emit nothing, no error)
    assert(got.length === 4)
    // …and the trained vocabulary SURVIVES exhaustion: tokenizing with
    // it charges each fully-merged word ONE token, not per-char OOV
    // (the empty winner must not wipe the vocab frame)
    val tok = TextAnalysis.bpeTokenize(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(tok.toSeq === Seq((1L, 5L, 5L, 277L)),
      "5 words, 1 BPE token each, 5000 div 18 chars")
  }

  test("q95 string-replace remap == greedy list merge over generated sequences") {
    // the load-bearing trick: replace(seq, '|a||b|', '|ab|') on the
    // wrapped form must equal the greedy left-to-right LIST merge for
    // ANY symbol sequence — exercised over a tiny alphabet where
    // symbols share prefixes/suffixes ("a" vs "aa" vs "ab"), the
    // adversarial cases for a substring-based rewrite
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val sym = Gen.oneOf("a", "b", "c", "aa", "ab", "ba", "aba")
    val row = for {
      n <- Gen.choose(0, 14)
      syms <- Gen.listOfN(n, sym)
      a <- sym
      b <- sym
    } yield (syms, a, b)
    val cases = Gen.listOfN(400, row)
      .pureApply(Gen.Parameters.default, Seed(7L))
    def applyMerge(syms: List[String], a: String, b: String): List[String] =
      syms match {
        case x :: y :: rest if x == a && y == b =>
          (a + b) :: applyMerge(rest, a, b)
        case x :: rest => x :: applyMerge(rest, a, b)
        case Nil => Nil
      }
    def wrap(syms: Seq[String]): String = syms.map("|" + _ + "|").mkString
    val df = cases.map { case (syms, a, b) =>
      (wrap(syms), a, b, wrap(applyMerge(syms.toList, a, b)))
    }.toDF("seq", "a", "b", "want")
    val mism = df.select(
        expr("replace(seq, concat('|', a, '||', b, '|'), " +
          "concat('|', a, b, '|'))").as("got"), col("want"))
      .filter(col("got") =!= col("want"))
    assert(mism.count() === 0)
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

  test("q103 source divergence equals a plain-Scala chi-square build") {
    val corpus = graft.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = corpus
      .flatMap { case (s, t) =>
        t.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).map(w => (s, w))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val freq: Map[(String, String), Long] = counts.map { case ((s, w), c) =>
      (s, w) -> c * 1000000L / totals(s)
    }
    val sumF = freq.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val sources = totals.keys.toSeq.sorted
    val expected = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
      a = sources(i); b = sources(j)
      sharedWords = freq.keySet.collect { case (`a`, w) if freq.contains((b, w)) => w }
      if sharedWords.nonEmpty
    } yield {
      val chiShared = sharedWords.toSeq.map { w =>
        val (fa, fb) = (freq((a, w)), freq((b, w)))
        if (fa + fb == 0) 0L else (fa - fb) * (fa - fb) / (fa + fb)
      }.sum
      val sharedFa = sharedWords.toSeq.map(w => freq((a, w))).sum
      val sharedFb = sharedWords.toSeq.map(w => freq((b, w))).sum
      (a, b, sharedWords.size.toLong,
        chiShared + (sumF(a) - sharedFa) + (sumF(b) - sharedFb))
    }).toSeq
    val got = TextAnalysis.sourceDivergence(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected.sortBy(p => (p._1, p._2)))
    assert(got.nonEmpty && got.exists(_._4 > 0L))
  }

  test("q157: context-pair lift matches a plain-Scala skip-gram census") {
    val out = TextAnalysis.contextLift(spark, dir).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("w1"),
        r.getAs[String]("w2"), r.getAs[Long]("n_pair"),
        r.getAs[Long]("lift_milli")))
    val texts = graft.Tables.documents(spark, dir).select("text").collect()
      .map(_.getString(0).trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq)
    val directed = texts.flatMap { ts =>
      (1 to TextAnalysis.CtxRadius).flatMap { k =>
        ts.indices.dropRight(k).flatMap { i =>
          Seq((ts(i), ts(i + k)), (ts(i + k), ts(i)))
        }
      }
    }
    val cab = directed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = cab.values.sum
    val ca = cab.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cb = cab.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val expected = cab.toSeq
      .filter(_._2 >= TextAnalysis.CtxMinPair)
      .map { case ((a, b), c) => (a, b, c, c * n * 1000L / (ca(a) * cb(b))) }
      .sortBy { case (a, b, _, l) => (-l, a, b) }
      .take(TextAnalysis.CtxTopK)
      .zipWithIndex.map { case ((a, b, c, l), i) => (i + 1L, a, b, c, l) }
    assert(out.toSeq === expected)
    assert(out.nonEmpty)
  }

  test("q168: textrank matches a plain-Scala weighted-pagerank replay") {
    val out = TextAnalysis.textrank(spark, dir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("rank_ppm"),
        r.getAs[Long]("degree")))
    assert(out.nonEmpty)
    val texts = graft.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val wsRe = (Det.WsClass + "+").r
    def toks(t: String): Array[String] = wsRe.split(t.trim)
    val tf = texts.flatMap(toks).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = tf.toSeq.sortBy { case (t, f) => (-f, t) }
      .take(TextAnalysis.TrVocab).map(_._1).toSet
    val w = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.map(toks).foreach { ts =>
      ts.zip(ts.drop(1)).foreach { case (a, b) =>
        if (a != b && vocab(a) && vocab(b)) {
          val k = if (a < b) (a, b) else (b, a)
          w(k) = w.getOrElse(k, 0L) + 1L
        }
      }
    }
    val adj = w.toSeq.flatMap { case ((u, v), c) => Seq((u, v, c), (v, u, c)) }
    val wsum = adj.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = wsum.keys.map(_ -> TextAnalysis.PrMassTr).toMap
    (1 to TextAnalysis.TrIters).foreach { _ =>
      val contrib = adj.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, c) =>
          (BigInt(c) * r(src) / wsum(src)).toLong }.sum
      }
      r = contrib.map { case (n, s) =>
        n -> (15L * TextAnalysis.PrMassTr / 100 + 85L * s / 100) }
    }
    val deg = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = r.toSeq.map { case (t, rp) => (t, rp, deg(t)) }
      .sortBy { case (t, rp, _) => (-rp, t) }
      .take(TextAnalysis.TrTopK)
    assert(out.toSeq === expected)
  }
}
