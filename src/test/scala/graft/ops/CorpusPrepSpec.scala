package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavioral tests for the corpus-prep family (q82–q84) against a
  * plain-Scala reference implementation on constructed documents —
  * one source per doc so the per-source rollup exposes per-doc flags. */
class CorpusPrepSpec extends SparkTestBase {

  import spark.implicits._

  /** (doc_id, text) fixtures that exercise each rule edge. */
  private val fixtures = Seq(
    // passes everything: long enough, stopwords, varied tokens
    1L -> ("the quick brown fox jumps over a lazy dog near the key " +
      "value store and the wide table scan path"),
    // too short → v_len (and v_stop can't fire 2 hits? "the" once)
    2L -> "tiny doc the end",
    // massive repetition of one token → v_maxrun + v_distinct
    3L -> ("the a key value " + Seq.fill(40)("spam").mkString(" ")),
    // long words → v_wordlen (mean word length > 10)
    4L -> ("the a key value " +
      Seq.fill(20)("supercalifragilistic internationalization").mkString(" ")),
    // empty text → v_len, v_stop
    5L -> "")

  private lazy val dir: String = {
    val d = tmpDir("corpus")
    fixtures.map { case (id, t) =>
      (id, t, "en", s"src$id", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  // ---- plain-Scala reference kernels --------------------------------
  private def toks(t: String): Seq[String] =
    t.trim.split("\\s+").toSeq // "" → Seq("") like Spark's split

  private def refMaxRun(ts: Seq[String]): Long =
    if (ts.isEmpty) 0L
    else ts.foldLeft((0L, "", 0L)) { case ((best, prev, run), w) =>
      val r = if (w == prev) run + 1 else 1L
      (math.max(best, r), w, r)
    }._1

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(8), 16)

  private def refChunks(ts: Seq[String]): Seq[String] = {
    if (ts.isEmpty) return Seq.empty
    val bpos = ts.indices.filter(i => i == 0 || h32(ts(i)) % 8 == 0)
    bpos.zipAll(bpos.drop(1), -1, ts.length).map { case (a, b) =>
      ts.slice(a, b).mkString(" ")
    }
  }

  test("q82 per-doc rule flags match the plain-Scala reference") {
    val got = CorpusPrep.qualityRules(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    fixtures.foreach { case (id, t) =>
      val ts = toks(t)
      val nTok = if (t.trim.isEmpty) 0L else ts.length.toLong
      val tokChars = t.replaceAll("\\s", "").length.toLong
      val stops = Set("the", "a", "key", "value")
      val vLen = if (nTok < 10 || nTok > 100000) 1L else 0L
      val vWl = if (tokChars < 3 * nTok || tokChars > 10 * nTok) 1L else 0L
      val vStop = if (ts.count(stops) < 2) 1L else 0L
      val vDis = if (ts.distinct.length * 5L < nTok) 1L else 0L
      val vRun = if (refMaxRun(ts) > 3) 1L else 0L
      val pass = if (vLen + vWl + vStop + vDis + vRun == 0) 1L else 0L
      assert(got(s"src$id") === ((pass, vLen, vWl, vStop, vDis, vRun)),
        s"doc $id flags")
    }
  }

  test("q83 chunking matches the reference and reconstructs each doc") {
    val got = CorpusPrep.cdcChunkDedup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // whole-corpus chunk multiset from the reference
    val all = fixtures.flatMap { case (id, t) =>
      (if (t.trim.isEmpty) Seq.empty else refChunks(toks(t)))
        .map(c => (s"src$id", md5Hex(c)))
    }
    val global = all.groupBy(_._2).view.mapValues(_.size).toMap
    fixtures.foreach { case (id, t) =>
      val src = s"src$id"
      if (t.trim.isEmpty) assert(!got.contains(src), s"doc $id empty")
      else {
        val mine = all.filter(_._1 == src).map(_._2)
        val expect = (mine.size.toLong, mine.distinct.size.toLong,
          mine.count(h => global(h) >= 2).toLong)
        assert(got(src) === expect, s"doc $id chunk stats")
        // chunks partition the token stream: token counts reconstruct
        val nTokens = refChunks(toks(t)).map(_.split(" ").length).sum
        assert(nTokens === toks(t).length, s"doc $id reconstruction")
      }
    }
  }

  test("q94 paragraph dedup keeps exactly the first instance of every chunk") {
    // cross-doc duplication fixtures: doc 11 is original, doc 12 a full
    // copy (every chunk removed), doc 13 shares a prefix, doc 14
    // repeats its own first half (internal dup)
    val base = "the quick brown fox jumps over a lazy dog near the key " +
      "value store and the wide table scan path"
    val tail = "fresh unique closing words never repeated anywhere else"
    val fx = Seq(
      11L -> base,
      12L -> base,
      13L -> (base + " " + tail),
      14L -> (tail + " " + tail),
      15L -> "")
    val d = tmpDir("paradedup")
    fx.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    // plain-Scala reference: chunk every doc, first occurrence by
    // (doc_id, position), reassemble survivors in position order
    val perDoc = fx.filter(_._2.trim.nonEmpty).map { case (id, t) =>
      id -> refChunks(toks(t))
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = perDoc.map { case (id, chunks) =>
      val kept = chunks.filter(c => seen.add(md5Hex(c)))
      id -> ((chunks.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = CorpusPrep.paragraphDedup(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got === expected)
    // the full copy lost everything; the original kept everything
    assert(got(12L)._2 === 0L && got(12L)._3 === "")
    assert(got(11L)._2 === got(11L)._1)
    // prefix-sharing doc kept strictly between 0 and all of its chunks
    assert(got(13L)._2 > 0L && got(13L)._2 < got(13L)._1)
  }

  test("q97 token-budget sieve equals a plain-Scala prefix-sum replay") {
    val sf = "/root/testdata/sf0.001"
    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val stops = TextAnalysis.LangProfiles.head._2.toSet
    val perDoc = corpus.map { case (id, src, t) =>
      val ts = if (t.trim.isEmpty) Seq.empty else toks(t)
      val n = ts.size.toLong
      val q = if (n > 0) math.round(ts.count(stops) * 1000.0 / n) else 0L
      (src, id, n, q)
    }
    val expected = perDoc.groupBy(_._1).toSeq.flatMap { case (_, docs) =>
      var cum = 0L
      docs.sortBy { case (_, id, _, q) => (-q, id) }.flatMap {
        case (src, id, n, q) =>
          cum += n
          if (cum <= CorpusPrep.TokenBudget) Some((src, id, n, q, cum))
          else None
      }
    }.sortBy(r => (r._1, r._2))
    val got = CorpusPrep.tokenBudgetCurate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    // the sieve must bind: some docs kept, some dropped, per source
    assert(got.nonEmpty && got.size < corpus.size)
  }

  test("q100 source-overlap matrix equals the reference chunk-set algebra") {
    val base = "the quick brown fox jumps over a lazy dog near the key " +
      "value store and the wide table scan path"
    val tail = "fresh unique closing words never repeated anywhere else"
    val d = tmpDir("overlap")
    Seq(
      (1L, base, "en", "srcA", 1L),
      (2L, base + " " + tail, "en", "srcB", 1L),
      (3L, "completely disjoint content with nothing shared here at all",
        "en", "srcC", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val sets = Map(
      "srcA" -> refChunks(toks(base)).map(md5Hex).toSet,
      "srcB" -> refChunks(toks(base + " " + tail)).map(md5Hex).toSet,
      "srcC" -> refChunks(toks(
        "completely disjoint content with nothing shared here at all"))
        .map(md5Hex).toSet)
    val expected = (for {
      Seq(a, b) <- sets.keys.toSeq.sorted.combinations(2)
      inter = sets(a).intersect(sets(b)).size.toLong if inter > 0
    } yield (a, b, inter, sets(a).size.toLong, sets(b).size.toLong,
      math.round(1000.0 * inter / math.min(sets(a).size, sets(b).size)))
    ).toSeq
    val got = CorpusPrep.sourceOverlap(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    assert(!got.exists(r => r._1 == "srcC" || r._2 == "srcC"),
      "a disjoint source shares no row")
    assert(got.exists(r => r._1 == "srcA" && r._2 == "srcB" && r._3 > 0))
  }

  test("q101 incremental dedup: exact and chunk-overlap drops, fresh docs keep") {
    // ids picked so md5-bucket(doc_id) < 10 ⇒ incoming {2, 9, 10},
    // ≥ 10 ⇒ store {1, 3} (verified below against the same hash)
    val stored = "the quick brown fox jumps over a lazy dog near the key " +
      "value store and the wide table scan path"
    val other = "some entirely distinct stored passage living in the store " +
      "with its own words"
    val fresh = "fresh unique incoming words never repeated anywhere else " +
      "in any stored document"
    val fx = Seq(
      (1L, stored, "store"), (3L, other, "store"),
      (2L, stored, "inc-exact"), // exact copy of a stored doc
      (9L, stored + " " + fresh, "inc-part"), // shares stored chunks
      (10L, fresh, "inc-fresh"),
      (44L, fresh, "inc-batchdup")) // same-batch copy of doc 10
    def b(i: Long) = java.lang.Long.parseLong(md5Hex(i.toString).take(8), 16) % 100
    assert(fx.collect { case (id, _, s) if s.startsWith("inc") => id }
      .forall(b(_) < CorpusPrep.IncomingPct))
    assert(Seq(1L, 3L).forall(b(_) >= CorpusPrep.IncomingPct))
    val d = tmpDir("incdedup")
    fx.map { case (id, t, tag) => (id, t, "en", tag, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = CorpusPrep.incrementalDedup(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet === Set(2L, 9L, 10L, 44L), "only incoming docs emit")
    assert(got(2L)._1 === 1L && got(2L)._3 === 0L,
      "exact copy of a stored doc is flagged and dropped")
    assert(got(10L) === ((0L, 0L, 1L)),
      "a fresh doc shares nothing and is kept")
    val (ex9, dup9, _) = got(9L)
    assert(ex9 === 0L && dup9 > 0L && dup9 < 1000L,
      s"partial-overlap doc scores strictly between (got $dup9)")
    // doc 44 duplicates doc 10 WITHIN the batch: invisible to the
    // store checks (fresh content, dup_milli 0) but caught by the
    // intra-batch keep-min rule — the first copy (10) keeps
    assert(got(44L) === ((1L, 0L, 0L)),
      "a same-batch later copy is flagged exact and dropped")
  }

  test("q84 sample is deterministic with ≤ k rows per source") {
    val sf = "/root/testdata/sf0.001"
    val a = CorpusPrep.perSourceSample(spark, sf).collect()
    val b = CorpusPrep.perSourceSample(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    val perSrc = a.groupBy(_.getString(0))
    val sizes = graft.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSrc.foreach { case (src, rows) =>
      assert(rows.length === math.min(5L, sizes(src)),
        s"$src sample size")
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (1L to rows.length).toSeq, s"$src ranks dense")
    }
  }

  test("q106 decile boundaries equal a plain-Scala histogram replay") {
    val dir = "/root/testdata/sf0.001"
    val stops = CorpusPrep.StopWords.toSet
    val perDoc = graft.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .map { r =>
        val ws = r.getString(1).trim
          .split("[ \t\n\f\r]+").toSeq.filter(_.nonEmpty)
        val n = if (r.getString(1).trim.isEmpty) 0L else ws.size.toLong
        val score = if (n == 0) 0L
        else ws.distinct.size * 1000000L / n +
          ws.count(stops) * 1000000L / n
        (r.getString(0), score)
      }
    val expected = perDoc.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      val scores = ds.map(_._2).sorted
      val n = scores.size.toLong
      val cums = scores.distinct.map(v =>
        v -> scores.count(_ <= v).toLong)
      (1L to CorpusPrep.CalibQuantiles).map { d =>
        val q = cums.collectFirst {
          case (v, cum) if cum * CorpusPrep.CalibQuantiles >= d * n => v
        }.get
        (src, d, q, n)
      }
    }.sortBy(p => (p._1, p._2))
    val got = CorpusPrep.qualityCalibration(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // boundaries must vary within at least one source, or the score
    // is degenerate and calibration measures nothing
    assert(got.groupBy(_._1).exists(_._2.map(_._3).distinct.size > 1))
  }

  test("q108 census equals a recomputation from its four stage frames") {
    val dir = "/root/testdata/sf0.001"
    val lang = TextAnalysis.langId(spark, dir)
      .select("doc_id", "is_match").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val canon = Dedup.erCanonical(spark, dir)
      .select("doc_id", "is_canonical").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val contam = DataPrep.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val qual = CorpusPrep.docQualityStats(spark, dir).collect().map { r =>
      val (nTok, tokChars) = (r.getAs[Long]("n_tok"), r.getAs[Long]("tok_chars"))
      val ok = nTok >= CorpusPrep.MinTokens && nTok <= CorpusPrep.MaxTokens &&
        tokChars >= 3 * nTok && tokChars <= 10 * nTok &&
        r.getAs[Long]("stop_hits") >= 2 &&
        r.getAs[Long]("n_distinct") * 5 >= nTok &&
        r.getAs[Long]("max_run") <= CorpusPrep.MaxRun
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"), nTok,
        if (ok) 1L else 0L)
    }
    val expected = qual.groupBy(_._2).toSeq.map { case (src, ds) =>
      val st = ds.map { case (id, _, nTok, q) =>
        val l = lang(id)
        val c = canon(id)
        val cl = if (contam(id)) 0L else 1L
        (l, l * q, l * q * c, l * q * c * cl, l * q * c * cl * nTok)
      }
      (src, ds.size.toLong, st.map(_._1).sum, st.map(_._2).sum,
        st.map(_._3).sum, st.map(_._4).sum, st.map(_._5).sum)
    }.sortBy(_._1)
    val got = CorpusPrep.curationFunnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // the funnel must narrow but not empty out
    assert(got.map(_._6).sum > 0, "final stage keeps at least one doc")
    assert(got.map(_._3).sum < got.map(_._2).sum, "langid stage binds")
  }

  test("q112 sliding chunks: stride/overlap geometry matches the reference") {
    val d = tmpDir("slide")
    val longDoc = (0 until 150).map(i => s"t$i").mkString(" ")
    Seq((1L, longDoc, "en", "s1", longDoc.length.toLong),
        (2L, "only three tokens", "en", "s2", 17L),
        (3L, "   ", "en", "s3", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = CorpusPrep.slidingChunks(spark, d)
      .select("doc_id", "chunk_idx", "start_tok", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // whitespace-only doc produces no chunks; a short doc one clamped window
    assert(!got.exists(_._1 == 3L))
    assert(got.filter(_._1 == 2L) === Seq((2L, 0L, 0L, 3L)))
    // 150 tokens → starts every 48 (0,48,96,144), tail windows clamp
    assert(got.filter(_._1 == 1L) === Seq(
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 64L),
      (1L, 2L, 96L, 54L), (1L, 3L, 144L, 6L)))
    // adjacent full windows overlap by exactly win − stride tokens
    assert(CorpusPrep.ChunkWin - CorpusPrep.ChunkStride === 16)
  }

  test("q155: openings reproduce a plain-Scala census of doc prefixes") {
    val dir = "/root/testdata/sf0.001"
    val out = CorpusPrep.templateOpenings(spark, dir).collect()
      .map(r => (r.getAs[String]("opening"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sources"), r.getAs[Long]("example_doc")))
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq))
      .filter(_._3.length >= CorpusPrep.OpeningTokens)
    val expected = docs
      .groupBy { case (_, _, ts) => ts.take(CorpusPrep.OpeningTokens).mkString(" ") }
      .view.mapValues(ds => (ds.length.toLong,
        ds.map(_._2).distinct.length.toLong, ds.map(_._1).min))
      .filter(_._2._1 >= CorpusPrep.TemplateMinDocs)
      .toSeq.map { case (o, (n, s2, e)) => (o, n, s2, e) }.sortBy(_._1)
    assert(out.toSeq === expected)
    assert(out.nonEmpty, "the synthetic corpus must surface some template")
  }
}
