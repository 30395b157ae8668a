package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavior tests for the profiling family (q113–q116): bigram census
  * edges, Simpson concentration extremes, KS drift's exact-integer
  * identity on constructed distributions, and the skew audit's
  * tie-break + ratio arithmetic. */
class ProfilingSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q113: single-word and empty documents contribute no bigrams; ties cut by (w1,w2)") {
    val out = Profiling.bigramTopk(spark, sf).collect()
    assert(out.nonEmpty)
    // ranks are 1..TopBigrams per lang, dense and deterministic
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ===
        (1L to rows.length.toLong))
      // counts non-increasing in rank order
      val byRank = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("cnt"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q114: Simpson ppm is 1e6 for a one-char doc and 1e6/n for all-distinct chars") {
    val docs = Seq(
      (1L, "aaaa", "en", "s", 4L), // one repeated char → 16*1e6/16 = 1e6
      (2L, "abcd", "en", "s", 4L), // all distinct → 4*1e6/16 = 250000
      (3L, "  \t ", "en", "s", 4L) // all whitespace → drops out
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("x")
    val cc = regexp_replace(col("text"), Det.WsClass, "")
    val chars = docs
      .select(col("doc_id"), cc.as("cc"))
      .filter(length(col("cc")) >= 1)
      .select(col("doc_id"), length(col("cc")).cast("long").as("n"),
        explode(transform(sequence(lit(1), length(col("cc"))),
          i => substring(col("cc"), i, lit(1)))).as("ch"))
    val out = chars.groupBy("doc_id", "n", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n")
      .agg(sum(col("c") * col("c")).as("sumsq"))
      .select(col("doc_id"), expr("sumsq * 1000000 div (n * n)").as("ppm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1000000L, 2L -> 250000L))
  }

  test("q115: identical distributions give ks=0; disjoint supports give ks_ppm=1e6") {
    // 2 sources, one value each, disjoint: at the lower value the
    // source holding it has full mass and the other none → D = 1.
    val d = Seq(("a", 10L), ("a", 10L), ("b", 20L), ("b", 20L))
      .toDF("source", "n_chars")
    val ks = ksOn(d)
    assert(ks("a") === 1000000L && ks("b") === 1000000L)
    // identical per-source distributions → every cum ratio equal → 0
    val same = Seq(("a", 5L), ("a", 7L), ("b", 5L), ("b", 7L))
      .toDF("source", "n_chars")
    val ks2 = ksOn(same)
    assert(ks2("a") === 0L && ks2("b") === 0L)
  }

  /** Run the q115 pipeline over an in-memory (source, n_chars) frame
    * by mirroring its logic through a temp dir-free path: we inline
    * the same column program against the given frame. */
  private def ksOn(d: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    import org.apache.spark.sql.expressions.Window
    val base = d.select(col("source"), col("n_chars").as("v"))
    val cnts = base.groupBy("source", "v").agg(count(lit(1)).as("c"))
    val srcs = base.groupBy("source").agg(count(lit(1)).as("n_s"))
    val grid = base.select("v").distinct()
    val full = srcs.crossJoin(broadcast(grid))
      .join(cnts, Seq("source", "v"), "left").na.fill(0L, Seq("c"))
    val cumW = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full.withColumn("cum_s", sum("c").over(cumW))
    val tot = cum.groupBy("v").agg(sum("c").as("cv"))
      .withColumn("cum_all", sum("cv").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("v", "cum_all")
    val nAll = base.agg(count(lit(1)).as("nn"))
    cum.join(broadcast(tot), Seq("v")).crossJoin(broadcast(nAll))
      .groupBy(col("source"), col("n_s"), col("nn"))
      .agg(max(abs(col("cum_s") * (col("nn") - col("n_s"))
        - (col("cum_all") - col("cum_s")) * col("n_s"))).as("ks_num"))
      .select(col("source"), expr("ks_num * 1000000 div (n_s * (nn - n_s))").as("ppm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("q116: heaviest-key tie breaks to the smallest key id; ratios are floor-div") {
    val out = Profiling.skewAudit(spark, sf).collect()
    assert(out.length === 4)
    out.foreach { r =>
      val n = r.getAs[Long]("n_rows"); val k = r.getAs[Long]("n_keys")
      val mx = r.getAs[Long]("max_key_rows")
      assert(r.getAs[Long]("max_share_ppm") === mx * 1000000L / n)
      assert(r.getAs[Long]("skew_ratio_milli") === mx * k * 1000L / n)
      assert(mx * k >= n) // max ≥ mean ⇒ ratio ≥ 1
    }
    // tie-break: two keys with the same max count → smallest key wins
    val tie = Seq(7L, 7L, 3L, 3L, 9L).toDF("k")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .agg(max(struct(col("cnt").as("c"), (-col("k")).as("nk"))).as("top"))
      .select((-col("top.nk")).as("top_key")).collect()(0).getLong(0)
    assert(tie === 3L)
  }

  test("q151: hapax tally matches a plain-Scala census; flag applies the threshold") {
    val out = Profiling.hapaxRatio(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq)
      .toMap
    assert(out.length === docs.size)
    val global = docs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    out.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
      val hapax = toks.count(t => global(t) == 1).toLong
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("n_hapax") === hapax)
      val ppm = hapax * 1000000L / math.max(toks.length.toLong, 1L)
      assert(r.getAs[Long]("hapax_ppm") === ppm)
      assert(r.getAs[Long]("flag_garbage") ===
        (if (ppm >= Profiling.HapaxFlagPpm) 1L else 0L))
    }
  }

  test("q163: rho matches a plain-Scala Spearman on min-ranks") {
    val out = Profiling.spearmanLenQuality(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars", "text").collect()
      .map { row =>
        val ts = row.getAs[String]("text").trim
          .split("[ \t\n\f\r]+").filter(_.nonEmpty)
        val ttr = if (ts.isEmpty) 0L
          else ts.distinct.length.toLong * 1000000L / ts.length
        (row.getAs[Long]("n_chars"), ttr)
      }
    def minRanks(vs: Seq[Long]): Seq[Long] =
      vs.map(v => 1L + vs.count(_ < v))
    val rx = minRanks(docs.map(_._1).toSeq)
    val ry = minRanks(docs.map(_._2).toSeq)
    val n = docs.length.toLong
    val num = BigInt(n) * rx.zip(ry).map { case (a, b) => BigInt(a) * b }.sum -
      BigInt(rx.sum) * ry.sum
    val dx = BigInt(n) * rx.map(a => BigInt(a) * a).sum - BigInt(rx.sum) * rx.sum
    val dy = BigInt(n) * ry.map(a => BigInt(a) * a).sum - BigInt(ry.sum) * ry.sum
    assert(r.getAs[Long]("n_docs") === n)
    assert(r.getAs[Long]("num") === num.toLong)
    assert(r.getAs[Long]("den_x") === dx.toLong)
    assert(r.getAs[Long]("den_y") === dy.toLong)
    val rho = math.round(1000.0 * num.toDouble /
      math.sqrt(dx.toDouble * dy.toDouble))
    assert(r.getAs[Long]("rho_milli") === rho)
    // the synthetic corpus obeys the length-vs-TTR law: strong negative
    assert(r.getAs[Long]("rho_milli") < -500L)
  }

  test("q152: exclusive grams match a plain-Scala census; ppm bounds hold") {
    val out = Profiling.sourceNovelty(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[String]("text").trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq))
    val bySource = docs.groupBy(_._1).view.mapValues(_.flatMap { case (_, ts) =>
      ts.sliding(Dedup.DupGramN).filter(_.size == Dedup.DupGramN)
        .map(_.mkString(" "))
    }.toSet).toMap
    assert(out.length === bySource.count(_._2.nonEmpty))
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = bySource(src)
      val others = bySource.collect { case (s2, g) if s2 != src => g }
        .foldLeft(Set.empty[String])(_ ++ _)
      val exclusive = mine.diff(others).size.toLong
      assert(r.getAs[Long]("n_grams") === mine.size.toLong)
      assert(r.getAs[Long]("n_exclusive") === exclusive)
      assert(r.getAs[Long]("novelty_ppm") ===
        exclusive * 1000000L / math.max(mine.size.toLong, 1L))
    }
  }

  private def scalaTokens(): Array[String] = {
    val wsRe = (Det.WsClass + "+").r
    graft.Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => wsRe.split(r.getString(0).trim)).filter(_.nonEmpty)
  }

  test("q169: slope matches a plain-Scala milli-log least squares; Zipf is falling") {
    val out = Profiling.zipfFit(spark, sf).collect()
    assert(out.length === 1)
    val head = scalaTokens().groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (t, f) => (-f, t) }.take(Profiling.ZipfTopN)
    val xy = head.zipWithIndex.map { case ((_, f), i) =>
      (math.round(1000 * math.log(i + 1.0)), math.round(1000 * math.log(f.toDouble)))
    }
    val n = BigInt(xy.length)
    val sx = BigInt(xy.map(_._1).sum); val sy = BigInt(xy.map(_._2).sum)
    val sxy = xy.map { case (x, y) => BigInt(x) * y }.sum
    val sxx = xy.map { case (x, _) => BigInt(x) * x }.sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    val r = out.head
    assert(r.getAs[Long]("n_ranks") === xy.length.toLong)
    assert(r.getAs[Long]("num") === num.toLong)
    assert(r.getAs[Long]("den") === den.toLong)
    assert(r.getAs[Long]("slope_milli") ===
      math.round(1000.0 * num.toDouble / den.toDouble))
    assert(r.getAs[Long]("slope_milli") < 0L, "rank-frequency must fall")
  }

  test("q170: fano matches the exact integer Var/mean over all docs, zeros included") {
    val out = Profiling.tokenBurstiness(spark, sf).collect()
    assert(out.nonEmpty)
    val wsRe = (Det.WsClass + "+").r
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        wsRe.split(r.getAs[String]("text").trim).filter(_.nonEmpty)))
    val nDocs = BigInt(docs.length)
    val perTok = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (t, id, g.length.toLong) } }
      .groupBy(_._1)
    out.foreach { r =>
      val tok = r.getAs[String]("token")
      val cs = perTok(tok).map(_._3)
      val tf = BigInt(cs.sum); val s2 = cs.map(c => BigInt(c) * c).sum
      assert(r.getAs[Long]("df") === cs.length.toLong)
      assert(r.getAs[Long]("tf") === tf.toLong)
      assert(r.getAs[Long]("fano_milli") ===
        (1000 * (nDocs * s2 - tf * tf) / (nDocs * tf)).toLong, s"token $tok")
    }
  }
}
