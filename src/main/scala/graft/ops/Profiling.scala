package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Corpus- and key-distribution profiling — the monitoring queries a
  * 100 TB ingest runs continuously to decide WHEN to act (re-mix,
  * re-shard, salt a join) rather than to transform data:
  *
  *  - q113 per-language top-k word bigrams (what is this corpus made
  *    of — the n-gram census behind boilerplate detection);
  *  - q114 per-document character diversity (Gini–Simpson
  *    concentration — the log-free cousin of char entropy, flags
  *    mojibake / repeated-char junk that token-level stats miss);
  *  - q115 per-source distributional drift as an exact integer
  *    Kolmogorov–Smirnov statistic (one-vs-rest over a bounded value
  *    grid);
  *  - q116 join-key skew audit (the numbers that decide salting /
  *    AQE skew handling before a join ships).
  *
  * Everything is integer arithmetic (counts, ppm/milli fixed-point by
  * truncating div) — the [[Det]] discipline; no logs, no float sums.
  */
object Profiling {

  // ---------------------------------------------------------------- q113
  private[ops] val TopBigrams = 5

  /** Top-k word bigrams per language (q113). Adjacent-pair explode is
    * scan-proportional (one pass, map-side); the census groupBy is the
    * only data shuffle; the per-language top-k is a rank window on the
    * K-language key — tiny. Ties pinned by (w1, w2) so the cut is
    * deterministic in both engines. */
  def bigramTopk(s: SparkSession, dir: String): DataFrame = {
    // Materialize the token array BEFORE the pairing lambda: an
    // expression referenced inside a higher-order-function lambda is
    // re-evaluated per element (no CSE across lambda scope), which
    // turns adjacent pairing into O(tokens²) re-splitting. One
    // projection + zip_with of the two shifted slices is O(tokens).
    val pairs = Tables.documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("lang"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("lang"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cnt = pairs.groupBy("lang", "w1", "w2")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc)
    cnt.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopBigrams)
      .orderBy("lang", "rk")
  }

  // ---------------------------------------------------------------- q114
  /** Per-document character diversity (q114): distinct non-whitespace
    * characters and the Gini–Simpson concentration Σcᵢ² · 10⁶ div n²
    * in ppm (1e6 = one repeated character; 1e6/n = all distinct).
    * Log-free by design — entropy needs ln, which the two engines
    * round differently ([[TextAnalysis.sourceDivergence]] argument) —
    * and Simpson ranks documents the same way for the junk screen.
    *
    * Scale shape: the char explode is scan-proportional; both
    * aggregations shuffle on doc_id (the second reuses the first's
    * key), so the cost is one wide pass — the same as any per-doc
    * token statistic. Documents that are all whitespace drop out
    * (n = 0 ⇒ no char rows) in both engines. */
  def charDiversity(s: SparkSession, dir: String): DataFrame = {
    // split(cc, "") yields the char array in ONE pass; the per-index
    // substring(cc, i, 1) form re-scans the string per element
    // (O(n²) per document — measured 3.3 s → sub-second at sf0.1).
    val chars = Tables.documents(s, dir)
      .select(col("doc_id"),
        regexp_replace(col("text"), WsClass, "").as("cc"))
      .filter(length(col("cc")) >= 1)
      .select(col("doc_id"), length(col("cc")).cast("long").as("n"),
        explode(split(col("cc"), "")).as("ch"))
    chars.groupBy("doc_id", "n", "ch")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n")
      .agg(count(lit(1)).cast("long").as("distinct_chars"),
        sum(col("c") * col("c")).as("sumsq"))
      .select(col("doc_id"), col("n").as("n_chars_ns"), col("distinct_chars"),
        expr("sumsq * 1000000 div (n * n)").as("simpson_ppm"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q115
  /** One-vs-rest Kolmogorov–Smirnov drift per source (q115), exact in
    * integers: for each source s over the n_chars distribution,
    *   KS·n_s·n_rest = max_v | cum_s(v)·n_rest − cum_rest(v)·n_s |
    * evaluated on the grid of ALL distinct values, reported raw and in
    * ppm. No interpolation, no doubles — the ECDF comparison is pure
    * counting, so both engines agree bit-for-bit.
    *
    * Scale shape: the value grid is the distinct set of a BOUNDED
    * statistic (like q62's profile, n_chars has ~hundreds of distinct
    * values however many rows exist), so grid × sources is a K-row
    * frame: the crossJoin(broadcast(grid)) is the declared K-row
    * nested-loop pattern, and the per-source cumulative window is
    * partitioned by source. The corpus-wide cumulative runs on the
    * grid alone (bounded rows, single partition by construction). The
    * only data-sized shuffle is the (source, v) census. */
  def ksDrift(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("source"), col("n_chars").as("v"))
    val cnts = d.groupBy("source", "v").agg(count(lit(1)).as("c"))
    val srcs = d.groupBy("source").agg(count(lit(1)).as("n_s"))
    val grid = d.select("v").distinct()
    val full = srcs.crossJoin(broadcast(grid))
      .join(cnts, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c"))
    val cumW = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = full.withColumn("cum_s", sum("c").over(cumW))
    val tot = cum.groupBy("v").agg(sum("c").as("cv"))
      .withColumn("cum_all", sum("cv").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("v", "cum_all")
    val nAll = d.agg(count(lit(1)).as("nn"))
    cum.join(broadcast(tot), Seq("v"))
      .crossJoin(broadcast(nAll))
      .groupBy(col("source"), col("n_s"), col("nn"))
      .agg(max(abs(col("cum_s") * (col("nn") - col("n_s"))
        - (col("cum_all") - col("cum_s")) * col("n_s"))).as("ks_num"))
      .select(col("source"), col("n_s").cast("long").as("n_s"),
        (col("nn") - col("n_s")).cast("long").as("n_rest"),
        col("ks_num").cast("long").as("ks_num"),
        // ks_num ≈ n_s·n_rest, so ×1e6 leaves int64 at a few million
        // docs per source; the scaled divide runs in DECIMAL(38,0)
        // (exact, and `div` returns BIGINT) — same bit-for-bit result,
        // no overflow until ~10^32. DuckDB's sums are HUGEINT already.
        expr("CAST(ks_num AS DECIMAL(38,0)) * 1000000 div (CAST(n_s AS DECIMAL(38,0)) * (nn - n_s))")
          .as("ks_ppm"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- q116
  /** The audited join keys: (label, table loader, key column). */
  private def keyCols(s: SparkSession, dir: String): Seq[(String, DataFrame)] = Seq(
    "lineitem.l_partkey" -> Tables.lineitem(s, dir).select(col("l_partkey").as("k")),
    "lineitem.l_suppkey" -> Tables.lineitem(s, dir).select(col("l_suppkey").as("k")),
    "orders.o_custkey" -> Tables.orders(s, dir).select(col("o_custkey").as("k")),
    "events.user_id" -> Tables.events(s, dir).select(col("user_id").as("k")))

  /** Join-key skew audit (q116): per audited key — row and key
    * cardinalities, the heaviest key and its share (ppm), and the
    * max/mean skew ratio (milli) that decides whether the key needs
    * salting ([[ScaleJoins]] q92) or plain hash partitioning. The
    * heaviest key's tie-break is the SMALLEST key id (struct-max over
    * (cnt, −k)), pinned in both engines.
    *
    * Scale shape: one groupBy per key (the same shuffle the audited
    * join itself would pay) followed by an all-to-one aggregate of
    * per-key counts — no windows, no sorts; branches union into a
    * 4-row frame. */
  def skewAudit(s: SparkSession, dir: String): DataFrame = {
    val branches = keyCols(s, dir).map { case (label, df) =>
      df.groupBy("k").agg(count(lit(1)).as("cnt"))
        .agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"),
          max(struct(col("cnt").as("c"), (-col("k")).as("nk"))).as("top"))
        .select(lit(label).as("key_col"),
          col("n_rows").cast("long").as("n_rows"),
          col("n_keys").cast("long").as("n_keys"),
          col("top.c").cast("long").as("max_key_rows"),
          (-col("top.nk")).cast("long").as("top_key"),
          expr("top.c * 1000000 div n_rows").as("max_share_ppm"),
          expr("top.c * n_keys * 1000 div n_rows").as("skew_ratio_milli"))
    }
    branches.reduce(_ unionByName _).orderBy("key_col")
  }

  // ---------------------------------------------------------------- q136
  /** q136: language × source association lift — for every cell of the
    * contingency table, observed·N·1000 div (row·col): 1000 = the
    * languages distribute independently of the source, above = this
    * source skews toward this language (the log-free PMI, same
    * reasoning as q75's integer PMI surrogate). The mixing diagnostic
    * that says WHERE language balance has to be enforced per source
    * rather than globally.
    *
    * Overflow bound: o·N·1000 needs o·N < 2^63/10³ — fine to ~3·10⁹
    * rows per cell; a larger deployment drops the scale factor or
    * pre-divides (documented, not silently wrong: longs would throw
    * on overflow under ANSI mode, and the census is the place you'd
    * notice first).
    *
    * Scale shape: one (lang, source) census with map-side partials;
    * margins derive from the constant-sized census itself via two
    * windows over K rows. */
  def langSourceLift(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables.documents(s, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    cell
      .withColumn("r", sum("o").over(Window.partitionBy("lang")))
      .withColumn("c", sum("o").over(Window.partitionBy("source")))
      .withColumn("nn", sum("o").over(Window.partitionBy(lit(1))))
      .select(col("lang"), col("source"), col("o").cast("long").as("n_docs"),
        expr("o * nn * 1000 div (r * c)").as("lift_milli"))
      .orderBy("lang", "source")
  }

  // ---------------------------------------------------------------- q150
  /** Target rows per compacted output file (the planner's bin size). */
  val CompactTargetRows = 4000L

  /** q150: compaction plan — greedy first-fit-in-order bin packing of
    * per-day lineitem "files" (row counts) into ~[[CompactTargetRows]]
    * output bins: the planner step of every small-file compaction job
    * (Delta OPTIMIZE / Iceberg rewrite). Bin id = running row total
    * BEFORE the file, DIV the target — files land in date order, a
    * file larger than the target gets a bin (or several dates' worth)
    * to itself, and the assignment is a pure prefix-sum function (no
    * driver loop, no RNG).
    *
    * Per bin: file count, exact row total, and the date span the bin
    * covers (compaction preserving rough date locality is what keeps
    * date-range scans cheap AFTER the rewrite).
    *
    * Scale shape: the per-day census is one hash-agg shuffle of
    * day-keyed partials; the prefix sum runs on the O(days) census
    * (single-partition window over a constant-bounded frame — days,
    * not rows); the bin rollup is a hash agg on bin id. At 100 TB the
    * census is still O(days·partitions-per-day) rows. */
  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    val files = Tables.lineitem(s, dir)
      .select(date_trunc("day", col("l_shipdate")).cast("date").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_rows"))
    val w = Window.orderBy("day")
    files
      .withColumn("prev_rows", coalesce(sum("n_rows").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"prev_rows div $CompactTargetRows"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum("n_rows").cast("long").as("n_rows"),
        min("day").as("min_day"), max("day").as("max_day"))
      .orderBy("bin")
  }

  // ---------------------------------------------------------------- q151
  /** Hapax-dominance flag threshold (≥ 50% corpus-unique tokens). */
  val HapaxFlagPpm = 500000L

  /** q151: hapax-ratio screen — per document, the fraction of its
    * tokens that are corpus-hapax (occur exactly once in the whole
    * corpus). OCR garbage, mojibake and random-string spam are hapax-
    * dominated; natural text is not. This is the corpus-STATISTICS
    * complement of q82's doc-local rules: the same document can pass
    * every local rule and still be flagged here.
    *
    * Scale shape: one token-keyed shuffle builds the global census;
    * the per-doc tally joins the exploded stream to the census on the
    * SAME token key (exchange-aligned hash join — hot tokens stay on
    * the build side) and re-aggregates by doc. Empty docs survive via
    * the final doc-keyed left join. */
  def hapaxRatio(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Det.words(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val census = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    val perDoc = toks.join(census, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum((col("n") === 1).cast("long")).as("n_hapax"))
    Tables.documents(s, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).cast("long").as("n_tokens"),
        coalesce(col("n_hapax"), lit(0L)).cast("long").as("n_hapax"))
      .withColumn("hapax_ppm",
        expr("n_hapax * 1000000 div greatest(n_tokens, 1)"))
      .withColumn("flag_garbage",
        (col("hapax_ppm") >= HapaxFlagPpm).cast("long"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q152
  /** q152: source novelty — per source, the fraction of its distinct
    * token 5-grams that appear in NO other source. The inter-source
    * diversity audit a mixture designer reads next to q73's weights:
    * a source whose grams all exist elsewhere adds volume, not
    * coverage.
    *
    * Scale shape: grams explode linearly (q74's kernel) and are
    * immediately reduced to DISTINCT (source, gram) — the gram-keyed
    * shuffle carries per-source distinct grams, so a gram repeated
    * across a million docs of one source is ONE row; the spread
    * census groups the same key (exchange reuse), and the per-source
    * rollup moves O(sources) rows. */
  def sourceNovelty(s: SparkSession, dir: String): DataFrame = {
    val n = Dedup.DupGramN
    val toks = Tables.documents(s, dir)
      .select(col("source"), Det.words(col("text")).as("ts"))
    val grams = toks.select(col("source"),
      explode(when(size(col("ts")) >= n,
        transform(sequence(lit(0), size(col("ts")) - lit(n)),
          i => array_join(slice(col("ts"), i + lit(1), lit(n)), " ")))
        .otherwise(array())).as("g"))
      .distinct()
    val spread = grams.groupBy("g").agg(count(lit(1)).as("n_sources"))
    grams.join(spread, "g")
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum((col("n_sources") === 1).cast("long")).cast("long").as("n_exclusive"))
      .withColumn("novelty_ppm",
        expr("n_exclusive * 1000000 div greatest(n_grams, 1)"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- q163
  /** q163: Spearman rank correlation between document length and
    * type-token ratio — the classic "longer text, lower lexical
    * diversity" law, as a monitored number. The first member of the
    * correlation family: min-ranks (SQL `rank()` semantics), exact
    * integer moment sums, and the single float op is the final sqrt —
    * the cosMicro discipline, so both engines agree bit-for-bit on
    * `rho_milli`. A zero-variance side yields NULL, never a division
    * error.
    *
    * Ranks WITHOUT a global sort: min-rank(v) = 1 + Σ count(v' < v),
    * read off the VALUE census (distinct lengths / ppm values —
    * bounded, the q115 CDF argument) and joined back on the value
    * key. So the data-sized work is two hash aggs and two census
    * joins; only the bounded census sees a single-partition window.
    * Moment sums run in DECIMAL(38,0): Σ rank² ≈ n³ leaves int64 at
    * ~2 M rows. */
  def spearmanLenQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Det.words(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val pd = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), countDistinct("tok").as("n_distinct"))
    val base = Tables.documents(s, dir).select("doc_id", "n_chars")
      .join(pd, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        expr("coalesce(n_distinct, 0) * 1000000 div greatest(coalesce(n_tokens, 0), 1)")
          .as("ttr_ppm"))
    def withRank(df: DataFrame, v: String, r: String): DataFrame = {
      val census = df.groupBy(v).agg(count(lit(1)).as("cnt"))
        .withColumn(r,
          coalesce(sum("cnt").over(Window.orderBy(col(v))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
        .select(col(v), col(r))
      df.join(census, v)
    }
    val ranked = withRank(withRank(base, "n_chars", "rx"), "ttr_ppm", "ry")
    ranked.agg(
        count(lit(1)).cast("long").as("n_docs"),
        Det.lsum(col("rx")).as("sx"), Det.lsum(col("ry")).as("sy"),
        sum(expr("CAST(rx AS DECIMAL(38,0)) * rx")).as("sxx"),
        sum(expr("CAST(ry AS DECIMAL(38,0)) * ry")).as("syy"),
        sum(expr("CAST(rx AS DECIMAL(38,0)) * ry")).as("sxy"))
      .select(col("n_docs"),
        expr("CAST(n_docs * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)").as("num"),
        expr("CAST(n_docs * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)").as("den_x"),
        expr("CAST(n_docs * syy - CAST(sy AS DECIMAL(38,0)) * sy AS BIGINT)").as("den_y"))
      .withColumn("rho_milli",
        expr("""CASE WHEN den_x = 0 OR den_y = 0 THEN NULL
               |ELSE CAST(round(1000.0 * num /
               |  sqrt(CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE))) AS BIGINT)
               |END""".stripMargin))
  }

  // ---------------------------------------------------------------- q169
  /** Zipf fit: ranks included in the log-log regression. */
  val ZipfTopN = 1000

  /** q169: Zipf exponent fit — least-squares slope of the log-log
    * rank-frequency curve over the top-[[ZipfTopN]] tokens. Natural
    * corpora fit slope ≈ −1; a much flatter or steeper slope flags
    * synthetic/templated or truncated-vocabulary text — the one-number
    * corpus-health check next to q145's coverage curve.
    *
    * Determinism: ln(rank) and ln(freq) are QUANTIZED to milli-log
    * integers first — `round(1000·ln(x))` of a BIGINT agrees across
    * engines unless ln lands within ~1e-16·x of a .0005 boundary
    * (≈1e-13 per value) — then every regression moment (Σx, Σy, Σxy,
    * Σxx) is exact DECIMAL(38,0) integer arithmetic, and only the
    * final slope/intercept divisions are float (the q163 final-sqrt
    * discipline, with ln in place of sqrt).
    *
    * Scale shape: one token-census hash agg; the top-N head is
    * TakeOrdered (constant rows); ranking + moments run on the N-row
    * frame (single-partition window over a constant frame — q145's
    * argument). */
  def zipfFit(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(Det.words(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val head = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok")).limit(ZipfTopN)
    val xy = head
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("tf").desc, col("tok"))))
      .select(
        expr("CAST(round(1000 * ln(rnk)) AS BIGINT)").as("x"),
        expr("CAST(round(1000 * ln(tf)) AS BIGINT)").as("y"))
    xy.agg(
        count(lit(1)).cast("long").as("n_ranks"),
        Det.lsum(col("x")).as("sx"), Det.lsum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .select(col("n_ranks"),
        expr("CAST(n_ranks * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)").as("num"),
        expr("CAST(n_ranks * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)").as("den"))
      .withColumn("slope_milli",
        expr("""CASE WHEN den = 0 THEN NULL
               |ELSE CAST(round(1000.0 * num / den) AS BIGINT) END""".stripMargin))
  }

  // ---------------------------------------------------------------- q170
  /** Burstiness census: vocabulary cap and output head. */
  val BurstVocab = 1024
  val BurstTopK = 100

  /** q170: token burstiness — for the top-[[BurstVocab]] tokens, the
    * Fano factor (variance-to-mean ratio, in milli) of the token's
    * per-document count INCLUDING the zero docs. Poisson scatter sits
    * near 1000; spam/template tokens concentrate in few documents and
    * score far above — the token-level screen that q47's doc-level
    * repetition stats can't see (a token can be rare per doc yet
    * pathologically clustered across docs).
    *
    * Exact integers end to end: with N docs, tf = Σc and s2 = Σc²,
    * Var/mean = (N·s2 − tf²) / (N·tf), so
    * fano_milli = 1000·(N·s2 − tf²) div (N·tf) — DECIMAL(38,0)
    * through the products (N·s2 ≤ 1e12·corpus tokens² is past int64
    * at petabyte scale).
    *
    * Scale shape: one (tok, doc) census (hash agg with map-side
    * combine), one tok-level rollup carrying Σc and Σc² as mergeable
    * partials, the N-doc count as a 1-row broadcast (declared BNLJ),
    * and a rank head — no window over data-sized frames. */
  def tokenBurstiness(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val perDoc = d
      .select(col("doc_id"), explode(Det.words(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
    val perTok = perDoc.groupBy("tok")
      .agg(count(lit(1)).as("df"), Det.lsum(col("c")).as("tf"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
      .orderBy(col("tf").desc, col("tok")).limit(BurstVocab)
    perTok.crossJoin(broadcast(d.agg(count(lit(1)).as("n_docs"))))
      .select(col("tok").as("token"),
        col("df").cast("long").as("df"), col("tf").cast("long").as("tf"),
        expr("""CAST(1000 * (n_docs * s2 - CAST(tf AS DECIMAL(38,0)) * tf)
               |div (CAST(n_docs AS DECIMAL(38,0)) * tf) AS BIGINT)"""
          .stripMargin).as("fano_milli"))
      .orderBy(col("fano_milli").desc, col("token"))
      .limit(BurstTopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q169_zipf_fit" -> (zipfFit _),
    "q170_token_burstiness" -> (tokenBurstiness _),
    "q163_spearman_corr" -> (spearmanLenQuality _),
    "q150_compaction_plan" -> (compactionPlan _),
    "q151_hapax_ratio" -> (hapaxRatio _),
    "q152_source_novelty" -> (sourceNovelty _),
    "q113_bigram_topk" -> (bigramTopk _),
    "q136_lang_source_lift" -> (langSourceLift _),
    "q114_char_diversity" -> (charDiversity _),
    "q115_ks_drift" -> (ksDrift _),
    "q116_skew_audit" -> (skewAudit _)
  )

  val oracles: Map[String, String] = Map(
    "q169_zipf_fit" ->
      s"""WITH toks AS (
         | SELECT tok FROM (
         |  SELECT unnest(${Det.wordsSql("text")}) AS tok FROM documents) t
         | WHERE len(tok) > 0),
         |head AS (
         | SELECT tok, count(*) AS tf FROM toks GROUP BY tok
         | ORDER BY tf DESC, tok LIMIT $ZipfTopN),
         |xy AS (
         | SELECT
         |  CAST(round(1000 * ln(row_number() OVER (ORDER BY tf DESC, tok)))
         |    AS BIGINT) AS x,
         |  CAST(round(1000 * ln(tf)) AS BIGINT) AS y
         | FROM head),
         |m AS (
         | SELECT CAST(count(*) AS BIGINT) AS n_ranks,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  sum(CAST(x AS HUGEINT) * y) AS sxy,
         |  sum(CAST(x AS HUGEINT) * x) AS sxx
         | FROM xy)
         |SELECT n_ranks,
         | CAST(n_ranks * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
         | CAST(n_ranks * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den,
         | CASE WHEN n_ranks * sxx - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
         |  ELSE CAST(round(1000.0
         |    * (n_ranks * sxy - CAST(sx AS HUGEINT) * sy)
         |    / (n_ranks * sxx - CAST(sx AS HUGEINT) * sx)) AS BIGINT)
         | END AS slope_milli
         |FROM m""".stripMargin,
    "q170_token_burstiness" ->
      s"""WITH toks AS (
         | SELECT doc_id, tok FROM (
         |  SELECT doc_id, unnest(${Det.wordsSql("text")}) AS tok
         |  FROM documents) t
         | WHERE len(tok) > 0),
         |pd AS (
         | SELECT tok, doc_id, count(*) AS c FROM toks GROUP BY 1, 2),
         |pt AS (
         | SELECT tok, count(*) AS df, CAST(sum(c) AS BIGINT) AS tf,
         |  sum(CAST(c AS HUGEINT) * c) AS s2
         | FROM pd GROUP BY tok
         | ORDER BY tf DESC, tok LIMIT $BurstVocab),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT tok AS token, CAST(df AS BIGINT) AS df, tf,
         | CAST(1000 * (n_docs * s2 - CAST(tf AS HUGEINT) * tf)
         |   // (CAST(n_docs AS HUGEINT) * tf) AS BIGINT) AS fano_milli
         |FROM pt CROSS JOIN n
         |ORDER BY fano_milli DESC, token LIMIT $BurstTopK""".stripMargin,
    "q163_spearman_corr" ->
      s"""WITH toks AS (
         | SELECT doc_id, tok FROM (
         |  SELECT doc_id, unnest(${Det.wordsSql("text")}) AS tok
         |  FROM documents) t
         | WHERE len(tok) > 0),
         |pd AS (
         | SELECT doc_id, count(*) AS n_tokens,
         |  count(DISTINCT tok) AS n_distinct
         | FROM toks GROUP BY doc_id),
         |base AS (
         | SELECT d.n_chars,
         |  coalesce(n_distinct, 0) * 1000000
         |    // greatest(coalesce(n_tokens, 0), 1) AS ttr_ppm
         | FROM documents d LEFT JOIN pd USING (doc_id)),
         |r AS (
         | SELECT rank() OVER (ORDER BY n_chars) AS rx,
         |        rank() OVER (ORDER BY ttr_ppm) AS ry
         | FROM base),
         |m AS (
         | SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         |  sum(CAST(rx AS HUGEINT) * rx) AS sxx,
         |  sum(CAST(ry AS HUGEINT) * ry) AS syy,
         |  sum(CAST(rx AS HUGEINT) * ry) AS sxy
         | FROM r)
         |SELECT n_docs,
         | CAST(n_docs * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS num,
         | CAST(n_docs * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS den_x,
         | CAST(n_docs * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS den_y,
         | CASE WHEN n_docs * sxx - CAST(sx AS HUGEINT) * sx = 0
         |    OR n_docs * syy - CAST(sy AS HUGEINT) * sy = 0 THEN NULL
         |  ELSE CAST(round(1000.0 * (n_docs * sxy - CAST(sx AS HUGEINT) * sy)
         |   / sqrt(CAST(n_docs * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
         |        * CAST(n_docs * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
         |   AS BIGINT)
         | END AS rho_milli
         |FROM m""".stripMargin,
    "q151_hapax_ratio" ->
      s"""WITH toks AS (
         | SELECT doc_id, tok FROM (
         |  SELECT doc_id, unnest(${Det.wordsSql("text")}) AS tok
         |  FROM documents) t
         | WHERE len(tok) > 0),
         |g AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
         |pd AS (
         | SELECT doc_id, count(*) AS n_tokens,
         |  sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS n_hapax
         | FROM toks JOIN g USING (tok) GROUP BY doc_id),
         |f AS (
         | SELECT d.doc_id,
         |  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(n_hapax, 0) AS BIGINT) AS n_hapax
         | FROM documents d LEFT JOIN pd USING (doc_id))
         |SELECT doc_id, n_tokens, n_hapax,
         | ${OracleSql.ppmSql("n_hapax", "greatest(n_tokens, 1)")} AS hapax_ppm,
         | CAST(${OracleSql.ppmSql("n_hapax", "greatest(n_tokens, 1)")} >= $HapaxFlagPpm
         |   AS BIGINT) AS flag_garbage
         |FROM f ORDER BY doc_id""".stripMargin,
    "q152_source_novelty" ->
      s"""WITH toks AS (
         | SELECT source, ${Det.wordsSql("text")} AS ts FROM documents),
         |grams AS (
         | SELECT DISTINCT source,
         |  array_to_string(ts[i:i+${Dedup.DupGramN - 1}], ' ') AS g
         | FROM toks, UNNEST(range(1, len(ts) - ${Dedup.DupGramN - 2})) AS t(i)),
         |spread AS (SELECT g, count(*) AS n_sources FROM grams GROUP BY g),
         |r AS (
         | SELECT source, count(*) AS n_grams,
         |  sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS n_exclusive
         | FROM grams JOIN spread USING (g) GROUP BY source)
         |SELECT source, CAST(n_grams AS BIGINT) AS n_grams,
         | CAST(n_exclusive AS BIGINT) AS n_exclusive,
         | ${OracleSql.ppmSql("n_exclusive", "greatest(n_grams, 1)")} AS novelty_ppm
         |FROM r ORDER BY source""".stripMargin,
    "q150_compaction_plan" ->
      s"""WITH files AS (
         | SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
         |  count(*) AS n_rows
         | FROM lineitem GROUP BY 1),
         |pre AS (
         | SELECT day, n_rows,
         |  coalesce(sum(n_rows) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_rows
         | FROM files),
         |b AS (
         | SELECT day, n_rows, prev_rows // $CompactTargetRows AS bin FROM pre)
         |SELECT CAST(bin AS BIGINT) AS bin,
         | CAST(count(*) AS BIGINT) AS n_files,
         | CAST(sum(n_rows) AS BIGINT) AS n_rows,
         | min(day) AS min_day, max(day) AS max_day
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q136_lang_source_lift" ->
      """WITH cell AS (
        | SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |m AS (
        | SELECT lang, source, o,
        |  sum(o) OVER (PARTITION BY lang) AS r,
        |  sum(o) OVER (PARTITION BY source) AS c,
        |  sum(o) OVER () AS nn
        | FROM cell)
        |SELECT lang, source, CAST(o AS BIGINT) AS n_docs,
        | CAST(o * nn * 1000 // (r * c) AS BIGINT) AS lift_milli
        |FROM m ORDER BY lang, source""".stripMargin,
    "q113_bigram_topk" ->
      s"""WITH t AS (SELECT lang, ${wordsSql("text")} AS ws
         |  FROM documents WHERE length(trim(text)) > 0 AND len(${wordsSql("text")}) >= 2),
         |b AS (SELECT lang, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
         |  FROM t, UNNEST(range(1, len(ws))) AS s(i)),
         |c AS (SELECT lang, w1, w2, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
         |r AS (SELECT lang, w1, w2, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, w1, w2) AS BIGINT) AS rk
         |  FROM c)
         |SELECT lang, w1, w2, cnt, rk FROM r WHERE rk <= $TopBigrams
         |ORDER BY lang, rk""".stripMargin,
    "q114_char_diversity" ->
      s"""WITH c0 AS (SELECT doc_id,
         |   regexp_replace(text, '$WsClass', '', 'g') AS cc
         |  FROM documents),
         |ch AS (SELECT doc_id, CAST(len(cc) AS BIGINT) AS n,
         |   substr(cc, CAST(i AS INT), 1) AS ch
         |  FROM c0, UNNEST(range(1, len(cc) + 1)) AS s(i)
         |  WHERE len(cc) >= 1),
         |cnt AS (SELECT doc_id, n, ch, count(*) AS c FROM ch GROUP BY 1, 2, 3)
         |SELECT doc_id, n AS n_chars_ns,
         | CAST(count(*) AS BIGINT) AS distinct_chars,
         | ${OracleSql.ppmSql("sum(c * c)", "(n * n)")} AS simpson_ppm
         |FROM cnt GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    "q115_ks_drift" ->
      s"""WITH srcs AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
        |grid AS (SELECT DISTINCT n_chars AS v FROM documents),
        |cnts AS (SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
        |filled AS (SELECT s.source, s.n_s, g.v, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN grid g
        |  LEFT JOIN cnts c ON c.source = s.source AND c.v = g.v),
        |cum AS (SELECT source, n_s, v,
        |   sum(c) OVER (PARTITION BY source ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
        |  FROM filled),
        |tot AS (SELECT v, sum(cv) OVER (ORDER BY v
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
        |  FROM (SELECT v, sum(c) AS cv FROM filled GROUP BY v)),
        |n AS (SELECT count(*) AS nn FROM documents)
        |SELECT source, CAST(n_s AS BIGINT) AS n_s,
        | CAST(nn - n_s AS BIGINT) AS n_rest,
        | CAST(max(abs(cum_s * (nn - n_s) - (cum_all - cum_s) * n_s)) AS BIGINT) AS ks_num,
        | ${OracleSql.ppmSql("max(abs(cum_s * (nn - n_s) - (cum_all - cum_s) * n_s))", "(n_s * (nn - n_s))")} AS ks_ppm
        |FROM cum JOIN tot USING (v), n
        |GROUP BY source, n_s, nn ORDER BY source""".stripMargin,
    "q116_skew_audit" -> {
      val keys = Seq(("lineitem.l_partkey", "l_partkey", "lineitem"),
        ("lineitem.l_suppkey", "l_suppkey", "lineitem"),
        ("orders.o_custkey", "o_custkey", "orders"),
        ("events.user_id", "user_id", "events"))
      val ctes = keys.map { case (_, k, tbl) =>
        s"""g_$k AS (SELECT $k AS k, count(*) AS cnt FROM $tbl GROUP BY 1),
           |m_$k AS (SELECT max(cnt) AS mx FROM g_$k)""".stripMargin
      }.mkString(",\n")
      val branch = keys.map { case (label, k, _) =>
        s"""SELECT '$label' AS key_col,
           | CAST(sum(cnt) AS BIGINT) AS n_rows,
           | CAST(count(*) AS BIGINT) AS n_keys,
           | CAST(max(cnt) AS BIGINT) AS max_key_rows,
           | CAST(min(CASE WHEN cnt = mx THEN k END) AS BIGINT) AS top_key,
           | ${OracleSql.ppmSql("max(cnt)", "sum(cnt)")} AS max_share_ppm,
           | CAST(max(cnt) * count(*) * 1000 // sum(cnt) AS BIGINT) AS skew_ratio_milli
           |FROM g_$k, m_$k GROUP BY mx""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $ctes\nSELECT * FROM (\n$branch\n) ORDER BY key_col"
    }
  )
}
