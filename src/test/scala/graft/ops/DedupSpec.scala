package graft.ops

import graft.SparkTestBase
import graft.functions.ArrayFunctions
import org.apache.spark.sql.functions._

/** Behavioral tests of the dedup family on constructed documents with
  * known duplicate structure (the oracle harness proves engine parity;
  * these prove the SEMANTICS: what is and is not a near-duplicate). */
class DedupSpec extends SparkTestBase {

  import spark.implicits._

  private val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo " +
    "sierra tango uniform victor whiskey xray yankee zulu one two three four"

  /** doc 0: base; doc 1: exact copy; doc 2: one word changed (near-dup);
    * doc 3: unrelated; doc 4: shuffled words (same set, different order). */
  private lazy val dir: String = {
    val d = tmpDir("docs")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),
      (2L, base.replace("november", "NOVEMBER-CHANGED"), "en", "src2", 1L),
      (3L, "totally different content with no overlap whatsoever at all " +
        "nothing shared here believe me not even a little bit of text", "de", "src3", 1L),
      (4L, base.split(" ").reverse.mkString(" "), "en", "src4", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")
    d
  }

  test("q28 finds exact and one-word-changed pairs, not unrelated or reshuffled docs") {
    val pairs = Dedup.minhashPairs(spark, dir)
      .select("doc_a", "doc_b", "j_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    // word-order shuffle destroys 3-gram shingles → NOT a near-dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("q28 exact copy scores j_milli = 1000") {
    val exact = Dedup.minhashPairs(spark, dir)
      .filter(col("doc_a") === 0 && col("doc_b") === 1)
      .select("j_milli").head().getLong(0)
    assert(exact === 1000L)
  }

  test("q29 keep-min survivor set drops the larger id of each verified pair") {
    val kept = Dedup.nearDedup(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // 1 and 2 drop (paired with 0); 3 and 4 survive
    assert(kept === Set(0L, 3L, 4L))
  }

  test("q30 simhash is identical for identical text, near for near-dups") {
    val sh = Dedup.simhashDocs(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) === sh(1L))
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) <= 6)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(3L)) > 6)
    // simhash is word-frequency based → order-insensitive: doc 4 collides
    assert(sh(4L) === sh(0L))
  }

  test("q31 banded simhash pairs include the exact-dup pair at hamming 0") {
    val pairs = Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0L))
  }

  test("q32 word-bigram anchor Jaccard flags the near pair, not the shuffle") {
    val pairs = Dedup.anchorJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("q99 containment finds the quoted-inside pair that Jaccard misses") {
    // doc 10: a short distinctive passage. doc 11: that passage quoted
    // verbatim inside 4× as much unrelated text — containment(10→11)
    // = 1000 but Jaccard ≈ 1/5, far below q28's bar.
    val quote = "zebra quokka axolotl pangolin capybara wombat " +
      "numbat dugong echidna cassowary kakapo hoatzin"
    val padding = (1 to 48).map(i => s"filler$i").mkString(" ")
    val d = tmpDir("contdocs")
    Seq(
      (10L, quote, "en", "s10", quote.length.toLong),
      (11L, s"$padding $quote $padding", "en", "s11", 1L),
      (12L, "completely unrelated words nothing shared at all here " +
        "believe me not one bit", "en", "s12", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = Dedup.containmentPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5), r.getLong(6)))
    assert(got.exists { case (a, b, c, cd) =>
      a == 10L && b == 11L && c == 1000L && cd == 10L },
      s"containment pair missing from ${got.toSeq}")
    assert(!got.exists(p => p._1 == 12L || p._2 == 12L))
    // the same pair is invisible to the Jaccard family on this corpus
    val j = Dedup.minhashPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((10L, 11L)),
      "q28 must NOT see the low-Jaccard containment pair — that gap is " +
        "exactly what q99 exists to close")
  }

  test("q52 labels transitive chains one cluster; q29's pairwise rule cannot") {
    // A chain A~B~C where A and C differ in TWO words (still near-dup
    // pairwise neighbors of B, and of each other only transitively).
    val d = tmpDir("ccdocs")
    val a = base
    val b = base.replace("november", "NOVEMBER-X")
    val c = base.replace("november", "NOVEMBER-X").replace("quebec", "QUEBEC-Y")
    Seq(
      (10L, a, "en", "s", 1L), (11L, b, "en", "s", 1L), (12L, c, "en", "s", 1L),
      (20L, "totally different content with no overlap whatsoever at all " +
        "nothing shared here believe me not even a little bit of text", "de", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = Dedup.dedupClusters(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("cluster_size"))).toMap
    assert(got(10L) == (10L, 3L) && got(11L) == (10L, 3L) && got(12L) == (10L, 3L),
      s"chain must collapse to one cluster labeled by its min id, got $got")
    assert(got(20L) == (20L, 1L), "unrelated doc is a singleton")
  }

  test("q52 is a fixpoint: every doc labeled, labels are cluster minima, no cache leak") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val got = Dedup.dedupClusters(spark, dir).collect()
    assert(got.length == 5, "every document gets a label, singletons included")
    val byCluster = got.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (lbl, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min == lbl,
        "cluster label is the min member id")
      members.foreach(m => assert(m.getAs[Long]("cluster_size") == members.length))
    }
    // docs 0,1,2 are pairwise near-dups → one cluster; 3 and 4 singletons
    assert(byCluster.keySet == Set(0L, 3L, 4L))
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1,
      "iteration caches must be released (only the localCheckpoint block row may remain)")
  }

  test("q56 pointer doubling ≡ q52 label propagation, chain and standard graphs") {
    // the same chain graph as the q52 test — transitivity is the case
    // that separates CC from pairwise rules
    val d = tmpDir("lsdocs")
    val a = base
    val b = base.replace("november", "NOVEMBER-X")
    val c = base.replace("november", "NOVEMBER-X").replace("quebec", "QUEBEC-Y")
    Seq(
      (10L, a, "en", "s", 1L), (11L, b, "en", "s", 1L), (12L, c, "en", "s", 1L),
      (20L, "totally different content with no overlap whatsoever at all " +
        "nothing shared here believe me not even a little bit of text", "de", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    Seq(d, dir).foreach { dd =>
      val viaUf = Dedup.dedupClustersLargeStar(spark, dd).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      // cap 0 forces the distributed large/small-star rounds
      val viaLs = Dedup.dedupClustersLargeStar(spark, dd, smallGraphCap = 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val viaProp = Dedup.dedupClusters(spark, dd).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(viaUf === viaProp, s"union-find path must agree on $dd")
      assert(viaLs === viaProp, s"large/small-star path must agree on $dd")
    }
  }

  test("q44 exact dedup keeps the min-id survivor per identical text only") {
    val rows = Dedup.exactDedup(spark, dir).collect()
    assert(rows.length === 4, "5 docs, one exact-copy pair → 4 groups")
    val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(0L) === 2L, "docs 0 and 1 collapse onto survivor 0")
    assert(!byId.contains(1L), "the larger id of an exact pair is dropped")
    // near-dup (2), unrelated (3), reshuffled (4) all survive singly —
    // exact dedup must not merge anything that differs by one byte
    assert(Seq(2L, 3L, 4L).forall(byId(_) === 1L))
  }

  test("sortedIntersectCount: merge semantics over sorted int sets") {
    val df = Seq(
      (Seq(1, 3, 5, 9), Seq(3, 5, 7)),
      (Seq[Int](), Seq(1, 2)),
      (Seq(1, 2, 3), Seq(4, 5, 6)),
      (Seq(2, 4), Seq(2, 4))
    ).toDF("a", "b")
    val got = df.select(
      ArrayFunctions.sortedIntersectCount(col("a"), col("b"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 0L, 0L, 2L))
  }

  test("sortedIntersectCount is null-safe") {
    val df = Seq((Some(Seq(1, 2)), Option.empty[Seq[Int]]))
      .toDF("a", "b")
    assert(df.select(ArrayFunctions.sortedIntersectCount(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("q74 dup-gram coverage equals a plain-Scala 5-gram build") {
    val rows = Dedup.dupGramCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // reference: sliding 5-grams per doc, dup = present in >= 2 docs
    val texts = Seq(0L -> base, 1L -> base,
      2L -> base.replace("november", "NOVEMBER-CHANGED"),
      3L -> ("totally different content with no overlap whatsoever at all " +
        "nothing shared here believe me not even a little bit of text"),
      4L -> base.split(" ").reverse.mkString(" "))
    val grams: Map[Long, Seq[String]] = texts.map { case (id, t) =>
      id -> t.trim.split("[ \t\n\f\r]+").toSeq.sliding(Dedup.DupGramN)
        .filter(_.size == Dedup.DupGramN).map(_.mkString(" ")).toSeq
    }.toMap
    val docFreq = grams.toSeq.flatMap { case (id, gs) =>
      gs.distinct.map(g => (g, id)) }.groupBy(_._1).view
      .mapValues(_.size).toMap
    val expected = texts.map(_._1).sorted.map { id =>
      val gs = grams(id)
      val dupPos = gs.count(g => docFreq(g) >= 2).toLong
      val dupDistinct = gs.distinct.count(g => docFreq(g) >= 2).toLong
      val n = gs.size.toLong
      (id, n, dupPos, dupDistinct, if (n > 0) dupPos * 1000 / n else 0L)
    }
    assert(rows === expected)
    // docs 0/1 are exact copies: full coverage; doc 3 shares nothing
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(0L)._5 === 1000L)
    assert(byId(1L)._5 === 1000L)
    assert(byId(3L)._3 === 0L)
  }

  test("q91 canonicalization: one canonical per cluster, longest doc wins") {
    val sf = "/root/testdata/sf0.001"
    val rows = Dedup.erCanonical(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val chars = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      val canons = members.filter(_._4 == 1L)
      assert(canons.length === 1, s"cluster $c canonical count")
      val canon = canons.head
      assert(members.forall(_._3 == canon._1), s"cluster $c mapping")
      // canonical has max n_chars (doc_id min as tie-break)
      val best = members.map(m => (chars(m._1), -m._1)).max
      assert((chars(canon._1), -canon._1) === best, s"cluster $c pick")
      assert(members.forall(_._5 == members.length.toLong))
    }
    // every document appears exactly once
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("q104 prefix-filtered join ≡ plain-Scala brute force over all pairs") {
    val sf = "/root/testdata/sf0.001"
    def shingleHashes(text: String): Set[Long] = {
      val ws = text.trim.split("[ \t\n\f\r]+").toSeq.filter(_.nonEmpty)
      val grams =
        if (ws.size >= 3)
          (0 to ws.size - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
        else Seq.empty
      grams.map { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16) % 2147483647L
      }.toSet
    }
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingleHashes(r.getString(1)))
      .filter(_._2.nonEmpty).sortBy(_._1)
    val expected = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (da, ha) = docs(i); (db, hb) = docs(j)
      inter = (ha & hb).size.toLong
      union = ha.size + hb.size - inter
      if inter * 1000000L >= Dedup.PfxJaccPpmMin * union
    } yield (da, db, inter, union, inter * 1000000L / union)).toSeq
    val got = Dedup.jaccardJoinExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // equality against brute force IS the completeness theorem: a pair
    // the prefix join missed (or fabricated) fails this set compare
    assert(got === expected)
    assert(got.nonEmpty, "corpus has no qualifying pairs — test is vacuous")
  }

  test("q104 length-capped hybrid ≡ brute force on an over-cap long-doc corpus") {
    // 5000 distinct words → 4998 distinct 3-gram shingles, past the
    // PfxMaxShinglesPerDoc=4096 threshold (round 13's first half
    // raised here; the hybrid must now just WORK). The corpus forces
    // every verify class at once: long×long (docs 0,1 — perturbed
    // tail, J ≈ 0.92), short×long (doc 4 = doc 0's first 3002 words:
    // inter 3000, union 4998, J = 0.6 — both sides pass the τ size
    // ratio), and short×short (docs 2,3 — the inline path must keep
    // running beside the hybrid's fetch path).
    val d = tmpDir("longdocs")
    val words = (0 until 5000).map(i => s"w$i")
    val longA = words.mkString(" ")
    val longB = (words.take(4800) ++ (0 until 200).map(i => s"x$i")).mkString(" ")
    val shortC = longA.split(" ").take(3002).mkString(" ")
    val docs = Seq(
      (0L, longA, "en", "src0", longA.length.toLong),
      (1L, longB, "en", "src1", longB.length.toLong),
      (2L, base, "en", "src2", base.length.toLong),
      (3L, base.replace("november", "NOVEMBER-CHANGED"), "en", "src3", 1L),
      (4L, shortC, "en", "src4", shortC.length.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    def shingleHashes(text: String): Set[Long] = {
      val ws = text.trim.split("[ \t\n\f\r]+").toSeq.filter(_.nonEmpty)
      val grams =
        if (ws.size >= 3)
          (0 to ws.size - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
        else Seq.empty
      grams.map { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16) % 2147483647L
      }.toSet
    }
    val sets = docs.map { case (id, text, _, _, _) => id -> shingleHashes(text) }
    assert(sets.count(_._2.size > Dedup.PfxMaxShinglesPerDoc) === 2,
      "fixture must contain exactly the two over-threshold docs")
    val expected = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (da, ha) = sets(i); (db, hb) = sets(j)
      inter = (ha & hb).size.toLong
      union = ha.size + hb.size - inter
      if inter * 1000000L >= Dedup.PfxJaccPpmMin * union
    } yield (da, db, inter, union, inter * 1000000L / union)).toSeq
    val got = Dedup.jaccardJoinExact(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    // non-vacuous: a long×long, a short×long, and a short×short pair
    val pairIds = expected.map(p => (p._1, p._2)).toSet
    assert(pairIds((0L, 1L)), "long×long pair missing from fixture")
    assert(pairIds((0L, 4L)), "short×long pair missing from fixture")
    assert(pairIds((2L, 3L)), "short×short pair missing from fixture")
  }

  test("q102 leakage flag matches a recomputation from q52 × q48 outputs") {
    val sf = "/root/testdata/sf0.001"
    val clusters = Dedup.dedupClusters(spark, sf)
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val splits = DataPrep.hashSplit(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = clusters.groupBy(_._2).view
      .mapValues(_.map(m => splits(m._1))).toMap
      .filter(_._2.length >= 2)
      .map { case (c, ss) =>
        c -> (ss.length.toLong, ss.count(_ == "train").toLong,
          ss.count(_ == "val").toLong, ss.count(_ == "test").toLong)
      }
    val got = Dedup.splitLeakage(spark, sf).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (c, (size, tr, va, te, leaky)) =>
      val (esize, etr, eva, ete) = expected(c)
      assert((size, tr, va, te) === (esize, etr, eva, ete), s"cluster $c census")
      assert(leaky === (if (etr > 0 && (eva > 0 || ete > 0)) 1L else 0L),
        s"cluster $c leaky")
    }
    // the flag must bind: a corpus where every multi-doc cluster is
    // leaky (or none is) would make this audit vacuously green
    assert(got.values.exists(_._5 == 1L) && got.values.exists(_._5 == 0L))
  }

  test("q109 signature estimates equal a plain-Scala minhash replay") {
    val sf = "/root/testdata/sf0.001"
    val P = 2147483647L
    def shingleHashes(text: String): Set[Long] = {
      val ws = text.trim.split("[ \t\n\f\r]+").toSeq.filter(_.nonEmpty)
      val grams =
        if (ws.size >= 3)
          (0 to ws.size - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
        else Seq.empty
      grams.map { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16) % P
      }.toSet
    }
    def sig(hs: Set[Long]): Seq[Long] =
      Dedup.Perms.map { case (a, b) => hs.map(x => (a * x + b) % P).min }
    val sigs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingleHashes(r.getString(1)))
      .filter(_._2.nonEmpty).map { case (id, hs) => id -> sig(hs) }.toMap
    val got = Dedup.minhashCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, j, nm, est, err) =>
      val expNm = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      assert(nm === expNm, s"pair ($a,$b) n_match")
      assert(est === nm * 1000 / Dedup.Perms.size, s"pair ($a,$b) est")
      assert(err === est - j, s"pair ($a,$b) err")
    }
    // the estimator must actually disagree with exact Jaccard
    // somewhere, or the calibration measures nothing
    assert(got.exists(_._6 != 0L))
  }

  test("q185: the curve is monotone and replays from the verified pair list") {
    val sf = "/root/testdata/sf0.001"
    val out = Dedup.dedupThresholdCurve(spark, sf).collect()
      .sortBy(_.getAs[Long]("j_milli_min"))
    assert(out.length === Dedup.DupThresholds.length)
    val pairs = Dedup.minhashPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("j_milli")))
    val nDocs = graft.Tables.documents(spark, sf).count()
    out.foreach { r =>
      val t = r.getAs[Long]("j_milli_min")
      val surv = pairs.filter(_._3 >= t)
      val docs = surv.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong
      assert(r.getAs[Long]("n_pairs") === surv.length.toLong, s"t=$t pairs")
      assert(r.getAs[Long]("n_docs_affected") === docs, s"t=$t docs")
      assert(r.getAs[Long]("affected_ppm") === docs * 1000000L / nDocs)
    }
    // raising the threshold can only shrink the curve
    val ns = out.map(_.getAs[Long]("n_pairs"))
    ns.zip(ns.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("q178: cluster split is leakage-free by construction and hash-exact") {
    val sf = "/root/testdata/sf0.001"
    val out = Dedup.clusterSplit(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[String]("split")))
    assert(out.nonEmpty)
    // covers every document exactly once
    assert(out.length === graft.Tables.documents(spark, sf).count())
    // every cluster lands in EXACTLY one split — zero leaky clusters
    out.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).distinct.length === 1, s"cluster ${g.head._2} leaks")
    }
    // the split is the q48 hash rule applied to the cluster id
    def h8(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    }
    out.foreach { case (id, cl, split) =>
      val b = h8(cl.toString) % 100
      val expect = if (b < DataPrep.TrainPct) "train"
        else if (b < DataPrep.ValPct) "val" else "test"
      assert(split === expect, s"doc $id cluster $cl")
    }
    // clusters agree with the q52 assignment
    val cl52 = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    out.foreach { case (id, cl, _) => assert(cl === cl52(id)) }
  }

  test("q176: packed-kernel dot equals a plain-Scala sparse replay; pairs are blocked") {
    val sf = "/root/testdata/sf0.001"
    val out = Dedup.tfidfCosineJoin(spark, sf).collect()
    assert(out.nonEmpty)
    // rebuild the exact weighted vectors in Scala (same caps, same h8)
    val wsRe = (Det.WsClass + "+").r
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        wsRe.split(r.getAs[String]("text").trim).filter(_.nonEmpty)))
    val tf = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).view.mapValues(_.length.toLong).toMap }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def h8(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val vecs = tf.map { case (id, m) =>
      id -> m.toSeq
        .map { case (t, f) =>
          h8(t) -> math.min(f * 1000 / dfreq(t), Dedup.TfIdfWCap) }
        .groupBy(_._1)
        .map { case (k, g) =>
          k -> math.min(g.map(_._2).sum, Dedup.TfIdfWCap) }
    }
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.collect { case (k, wa) if vb.contains(k) => wa * vb(k) }.sum
      assert(r.getAs[Long]("dot") === dot, s"pair ($a,$b) dot")
      val n2a = va.values.map(w => w * w).sum
      val n2b = vb.values.map(w => w * w).sum
      val cos = math.round(1e6 * dot / math.sqrt(n2a.toDouble * n2b.toDouble))
      assert(r.getAs[Long]("cos_micro") === cos, s"pair ($a,$b) cos")
      assert(cos >= Dedup.TfIdfCosMicroMin)
      // blocking invariant: the pair shares at least one rare token
      val shared = tf(a).keySet.intersect(tf(b).keySet)
      assert(shared.exists(t =>
        dfreq(t) >= 2 && dfreq(t) <= Dedup.TfIdfDfCap), s"pair ($a,$b) blocking")
    }
  }
}
