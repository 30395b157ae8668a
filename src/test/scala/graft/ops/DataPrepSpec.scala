package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q47–q51 kernels on handcrafted documents/events where every
  * statistic is checkable by eye. */
class DataPrepSpec extends SparkTestBase {

  import spark.implicits._

  /** a: clean (8 tokens, 1 repeat); b: degenerate "spam spam …";
    * c: single token (no bigrams); d: half-and-half repetition. */
  private lazy val docsDir: String = {
    val d = tmpDir("dataprep")
    Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf alpha", "en", "s1", 48L),
      (2L, "spam spam spam spam spam spam spam spam spam spam", "en", "s2", 49L),
      (3L, "single", "de", "s3", 6L),
      (4L, "x y x y x y z w", "fr", "s4", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q47: repetition stats — counts, integer per-milles, keep flag") {
    val rows = DataPrep.repetitionStats(spark, docsDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val a = rows(1L)
    assert(a.getAs[Long]("n_tokens") == 8 && a.getAs[Long]("n_distinct") == 7)
    assert(a.getAs[Long]("top_token_count") == 2) // "alpha" twice
    assert(a.getAs[Long]("dup_token_milli") == 125) // 1000/8
    assert(a.getAs[Long]("top_bigram_milli") == 142) // 1*1000 div 7
    assert(a.getAs[Long]("keep") == 1)

    val b = rows(2L)
    assert(b.getAs[Long]("dup_token_milli") == 900) // 9*1000 div 10
    assert(b.getAs[Long]("top_bigram_count") == 9) // "spam spam" ×9
    assert(b.getAs[Long]("top_bigram_milli") == 1000)
    assert(b.getAs[Long]("keep") == 0)

    val c = rows(3L)
    assert(c.getAs[Long]("n_bigrams") == 0 && c.getAs[Long]("top_bigram_count") == 0)
    assert(c.getAs[Long]("top_bigram_milli") == 0)
    assert(c.getAs[Long]("keep") == 1)

    val dd = rows(4L)
    assert(dd.getAs[Long]("n_tokens") == 8 && dd.getAs[Long]("n_distinct") == 4)
    assert(dd.getAs[Long]("dup_token_milli") == 500)
    assert(dd.getAs[Long]("top_bigram_count") == 3) // "y x" ×3
    assert(dd.getAs[Long]("top_bigram_milli") == 428) // 3000 div 7
    assert(dd.getAs[Long]("keep") == 1, // under the min-bigram guard
      "tiny doc passes the bigram filter, dup fraction is within bounds")
  }

  test("q48: hash split is deterministic, total, and hits the bucket bounds") {
    val one = DataPrep.hashSplit(spark, docsDir).collect()
    val two = DataPrep.hashSplit(spark, docsDir).collect()
    assert(one.toSeq == two.toSeq, "re-run must give identical membership")
    assert(one.length == 4)
    one.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val s = r.getAs[String]("split")
      assert(b >= 0 && b < 100)
      val expect = if (b < DataPrep.TrainPct) "train"
        else if (b < DataPrep.ValPct) "val" else "test"
      assert(s == expect)
    }
  }

  test("q49: tf-idf ranks rare terms above common ones, ties by term") {
    // common appears in all 3 docs; rare terms only in one
    val d = tmpDir("tfidf")
    Seq((1L, "common rare1 common", "en", "s", 1L),
        (2L, "common rare2", "en", "s", 1L),
        (3L, "common", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = DataPrep.tfIdfTopTerms(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("score"), r.getAs[Long]("rnk")))
    // doc 1: rare1 df=1 → idf 3000, score 3000; common tf=2 df=3 → 2000
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq(("rare1", 3000L, 1L), ("common", 2000L, 2L)))
    assert(got.filter(_._1 == 3L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq(("common", 1000L, 1L)))
  }

  test("q50: stratified sample respects per-stratum rates and is deterministic") {
    val d = tmpDir("strat")
    // 200 en + 200 zh docs: en @10% and zh @50% should separate clearly
    (0L until 400L).map(i =>
        (i, s"text $i", if (i < 200) "en" else "zh", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val kept = DataPrep.stratifiedSample(spark, d).collect()
    val byLang = kept.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    val en = byLang.getOrElse("en", 0)
    val zh = byLang.getOrElse("zh", 0)
    assert(en > 0 && en < 60, s"en @100/1000 of 200 docs, got $en")
    assert(zh > 60 && zh < 140, s"zh @500/1000 of 200 docs, got $zh")
    val rates = DataPrep.StratRates.toMap
    kept.foreach(r => assert(r.getAs[Long]("bucket") <
      rates(r.getAs[String]("lang"))))
    assert(DataPrep.stratifiedSample(spark, d).collect().toSeq == kept.toSeq)
  }

  test("q51: decile bins are balanced within each event_type and ordered by value") {
    val d = tmpDir("bins")
    val rows = (1L to 100L).map(i => (i, java.sql.Timestamp.valueOf(
        "2026-01-01 00:00:00"), i % 7, "click", i.toDouble / 4, "{}")) ++
      (101L to 130L).map(i => (i, java.sql.Timestamp.valueOf(
        "2026-01-01 00:00:00"), i % 7, "view", -i.toDouble, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = DataPrep.featureBins(spark, d).collect()
    val clicks = got.filter(_.getAs[String]("event_type") == "click")
    // 100 rows → exactly 10 per decile
    assert(clicks.groupBy(_.getAs[Long]("bin")).forall(_._2.length == 10))
    // bin is monotone in value
    val sorted = clicks.sortBy(_.getAs[Long]("value_cents"))
    assert(sorted.map(_.getAs[Long]("bin")).toSeq == sorted.map(_.getAs[Long]("bin")).toSeq.sorted)
    // 30 views → ntile: bins 1..10 of size 3
    val views = got.filter(_.getAs[String]("event_type") == "view")
    assert(views.groupBy(_.getAs[Long]("bin")).forall(_._2.length == 3))
  }

  test("q53: scrubs emails, ips, then digit runs, counting each at its own stage") {
    val d = tmpDir("pii")
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    Seq(
      (1L, ts, 42L, "login", 0.0, """{"mail": "bob.smith+x@corp.example.com"}"""),
      (2L, ts, 7L, "conn", 0.0, """{"src": "10.0.255.1", "port": 8080}"""),
      (3L, ts, 5L, "plain", 0.0, """{"k": 9}"""),
      (4L, ts, 3L, null, 0.0, null))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = DataPrep.piiScrub(spark, d).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap

    val mail = got(1L)
    assert(mail.getAs[String]("redacted") ===
      """login uid=<NUM> props={"mail": "<EMAIL>"}""")
    assert(mail.getAs[Long]("n_email") == 1 && mail.getAs[Long]("n_ip") == 0 &&
      mail.getAs[Long]("n_num") == 1, "digits inside the email are not re-counted")

    val conn = got(2L)
    assert(conn.getAs[String]("redacted") ===
      """conn uid=<NUM> props={"src": "<IP>", "port": <NUM>}""")
    assert(conn.getAs[Long]("n_ip") == 1 && conn.getAs[Long]("n_num") == 2)

    assert(got(3L).getAs[String]("redacted") === """plain uid=<NUM> props={"k": <NUM>}""")
    // nulls render as empty, never null-propagate the whole line
    assert(got(4L).getAs[String]("redacted") === " uid=<NUM> props=")
  }

  test("q54: flags only train docs sharing an 8-gram with the eval slice") {
    val d = tmpDir("decon")
    val eval0 = "one two three four five six seven eight nine ten"
    // 21: shares the 8-gram window "two … nine" (differs at both ends)
    val contaminated = "ZZZ two three four five six seven eight nine YYY"
    val clean = "totally different words with no shared window at all here ok"
    val short = "one two three" // < 8 words → no grams, never flagged
    Seq((0L, eval0), (21L, contaminated), (22L, clean), (23L, short))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = DataPrep.decontaminate(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
        r.getAs[Long]("contam_milli")))
    // doc 21 has 3 8-grams; exactly one ("two…nine") appears in doc 0
    assert(rows === Array((21L, 3L, 1L, 333L)),
      s"only the contaminated train doc is flagged, got ${rows.toSeq}")
  }

  test("q110: span coverage merges overlapping hit windows exactly") {
    val d = tmpDir("contamspan")
    val eval0 = "one two three four five six seven eight nine ten"
    // 21: TWO overlapping hit grams (1..8 and 2..9) → spans [1,8] ∪
    // [2,9] = 9 covered tokens of 12, NOT 16
    val overlap = "one two three four five six seven eight nine AAA BBB CCC"
    // 22: one hit gram in the middle of 12 tokens → 8 covered
    val single = "XXX two three four five six seven eight nine YYY ZZZ WWW"
    val clean = "totally different words with no shared window at all here ok"
    Seq((0L, eval0), (21L, overlap), (22L, single), (23L, clean))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = DataPrep.contamSpans(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_hit_grams"), r.getAs[Long]("covered_tokens"),
        r.getAs[Long]("covered_ppm")))
    assert(rows === Array(
      (21L, 12L, 2L, 9L, 9L * 1000000L / 12L),
      (22L, 12L, 1L, 8L, 8L * 1000000L / 12L)),
      s"got ${rows.toSeq}")
  }

  test("q110 agrees with q54 on WHICH docs are contaminated") {
    val dir = "/root/testdata/sf0.001"
    val spanDocs = DataPrep.contamSpans(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val q54Docs = DataPrep.decontaminate(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(spanDocs === q54Docs)
  }

  test("q55: packing is a per-shard gapless token stream cut at SeqLen") {
    val got = DataPrep.sequencePack(spark, docsDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_offset")))
    assert(got.length == 4, "every doc is packed")
    // within each shard, docs occupy a contiguous token stream in
    // doc_id order: each start equals the previous start + n_tokens
    got.groupBy(_._2).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._1)
      val starts = inOrder.map(d => d._4 * DataPrep.SeqLen + d._5)
      val expected = inOrder.map(_._3).scanLeft(0L)(_ + _).init
      assert(starts.toSeq == expected.toSeq,
        s"gapless stream per shard, got ${inOrder.toSeq}")
    }
    // determinism: identical assignment on a re-run
    val again = DataPrep.sequencePack(spark, docsDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_offset")))
    assert(again.toSeq == got.map(r => (r._1, r._4, r._5)).toSeq)
  }

  test("q162: buckets are rank-balanced with ordered, covering bounds") {
    val sf = "/root/testdata/sf0.001"
    val out = DataPrep.equiDepthHist(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (typ, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("bucket"))
      assert(sorted.map(_.getAs[Long]("bucket")).toSeq ===
        (0L until DataPrep.DepthBins))
      val n = sorted.map(_.getAs[Long]("n")).sum
      // rank split: every bucket holds floor/ceil(n/B) rows
      sorted.foreach { r =>
        val c = r.getAs[Long]("n")
        assert(c == n / DataPrep.DepthBins || c == n / DataPrep.DepthBins + 1,
          s"$typ bucket ${r.getAs[Long]("bucket")} holds $c of $n")
        assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
      }
      // bounds are non-decreasing across buckets (ties may touch)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents") ||
          a.getAs[Long]("hi_cents") == b.getAs[Long]("lo_cents"))
      }
      // row conservation for the group
      val direct = graft.Tables.events(spark, sf)
        .filter(col("event_type") === typ).count()
      assert(n === direct)
    }
  }

  test("q179: the curve replays from per-doc token counts; loss is monotone falling") {
    val sf = "/root/testdata/sf0.001"
    val out = DataPrep.truncationCurve(spark, sf).collect()
    assert(out.length === DataPrep.LossThresholds.length)
    val wsRe = (Det.WsClass + "+").r
    val nToks = graft.Tables.documents(spark, sf)
      .select("text").collect()
      .map(r => wsRe.split(r.getString(0).trim).count(_.nonEmpty).toLong)
    val total = nToks.sum
    out.foreach { r =>
      val l = r.getAs[Long]("max_len")
      val truncated = nToks.count(_ > l).toLong
      val lost = nToks.map(n => math.max(0L, n - l)).sum
      assert(r.getAs[Long]("n_truncated") === truncated, s"L=$l")
      assert(r.getAs[Long]("tokens_lost") === lost, s"L=$l")
      assert(r.getAs[Long]("trunc_ppm") === truncated * 1000000L / nToks.length)
      assert(r.getAs[Long]("loss_ppm") === lost * 1000000L / math.max(total, 1L))
    }
    val losses = out.sortBy(_.getAs[Long]("max_len")).map(_.getAs[Long]("loss_ppm"))
    losses.zip(losses.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("q171: normalized value is the global k-th smallest at the matched rank") {
    val sf = "/root/testdata/sf0.001"
    val out = DataPrep.quantileNormalize(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val globalSorted = docs.map(_._2).sorted
    val n = docs.length.toLong
    val bySource = docs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // the mapping table covers every (source, value) census row
    assert(out.length ===
      docs.map(d => (d._1, d._2)).distinct.length)
    out.foreach { row =>
      val (src, v) = (row.getAs[String]("source"), row.getAs[Long]("value"))
      val vals = bySource(src)
      val r = vals.count(_ <= v).toLong
      val ns = vals.length.toLong
      val k = (r * n + ns - 1) / ns
      assert(row.getAs[Long]("n_docs") === vals.count(_ == v).toLong)
      assert(row.getAs[Long]("pct_ppm") === r * 1000000L / ns)
      assert(row.getAs[Long]("norm_value") === globalSorted((k - 1).toInt),
        s"source $src value $v rank $r → k $k")
    }
    // a source whose lengths skew low maps its top value near the
    // global top: the last census row of EVERY source maps to max
    out.groupBy(_.getAs[String]("source")).values.foreach { g =>
      val last = g.maxBy(_.getAs[Long]("value"))
      assert(last.getAs[Long]("norm_value") === globalSorted.last)
    }
  }
}
