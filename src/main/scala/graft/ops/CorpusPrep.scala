package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-preparation operators a training-data pipeline runs between
  * raw ingest and tokenization: rule-based quality filtering (q82),
  * content-defined chunk dedup (q83), and deterministic per-source
  * sampling (q84). All arithmetic is integer (counts, fixed-point
  * ratios) so the DuckDB oracle matches cell-for-cell.
  *
  * Scale design:
  *   - q82 is per-row array kernels (no explode) followed by ONE
  *     groupBy(source): the per-doc rule flags never leave the map
  *     side, so the shuffle moves O(sources) rows, not O(docs).
  *   - q83 computes chunk boundaries per row with array lambdas —
  *     the classic rolling-hash CDC shape, evaluated inside codegen —
  *     then shuffles once on chunk_hash (global dup counting) and once
  *     on source (rollup). The chunk-hash exchange is the same one a
  *     petabyte dedup would bucket its store by.
  *   - q84's per-key top-k uses a rank window; at 100 TB the
  *     partial-ordering trick still applies (rank only needs each
  *     source's rows co-located once — one exchange, no global sort).
  */
object CorpusPrep {

  private def words(c: Column): Column = Det.words(c)

  // -------------------------------------------------------------- q82
  /** Gopher/C4-style quality rules, rolled up per source.
    *
    * Rules (violation = outside bound):
    *   r_len      — token count in [MinTokens, MaxTokens]
    *   r_wordlen  — mean word length in [3, 10] chars (integer cross-
    *                multiplication, no division)
    *   r_stop     — ≥ 2 hits on the English stopword profile
    *   r_distinct — distinct-token ratio ≥ 20% (repetition screen)
    *   r_maxrun   — longest run of one repeated token ≤ MaxRun
    *
    * The max-run screen is computed with array lambdas: boundary
    * positions where ts[i] ≠ ts[i−1], run lengths as differences of
    * consecutive boundaries — O(n) per row, shuffle-free. */
  private[ops] val MinTokens = 10L
  private[ops] val MaxTokens = 100000L
  private[ops] val MaxRun = 3L
  private[ops] val StopWords = TextAnalysis.LangProfiles.head._2 // en profile

  /** One-pass scan state over the token array: (prev token, current
    * run, longest run, stopword hits). A single `aggregate()` HOF
    * replaces the boundary-position construction — higher-order
    * lambdas evaluate interpreted (outside whole-stage codegen), so
    * the constant factor is per PASS over the array; one fused pass
    * measured 6× faster than the 3-pass filter/zip_with/array_max
    * chain at sf0.1 (13.2 s → ~2 s for the full q82). */
  private def scanStats(ts: Column): Column =
    aggregate(ts,
      struct(lit("\u0000").as("prev"), lit(0L).as("run"),
        lit(0L).as("max_run"), lit(0L).as("stops")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("max_run"), run).as("max_run"),
          (acc.getField("stops") +
            when(w.isin(StopWords.map(lit): _*), 1L).otherwise(0L))
            .as("stops"))
      })

  /** Per-document rule inputs, shared by q82 (rollup) and q106
    * (quantile calibration) — one definition of "the quality stats"
    * so the calibrated score can never drift from the rules. */
  private[ops] def docQualityStats(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), t, words(t).as("ts")) // split ONCE
      .withColumn("sc", scanStats(col("ts")))
      .select(
        col("doc_id"), col("source"),
        when(length(trim(t)) === 0, lit(0L))
          .otherwise(size(col("ts"))).cast("long").as("n_tok"),
        length(regexp_replace(t, Det.WsClass, "")).cast("long").as("tok_chars"),
        size(array_distinct(col("ts"))).cast("long").as("n_distinct"),
        col("sc.stops").as("stop_hits"),
        col("sc.max_run").as("max_run"))
  }

  // ---------------------------------------------------------------- q126
  /** q126: per-source percentile-rank normalization of the q106
    * quality score — map each doc's score to its rank position
    * (r−1)·10⁶ div (n−1) within its source, the standard transform
    * before mixing sources whose raw score SCALES are incomparable
    * (q106 shows the deciles differ per source; this makes a 0.9
    * mean the same thing everywhere). Rank ties break on doc_id so
    * the mapping is a deterministic function of the corpus.
    *
    * Scale shape: one rank window partitioned by source (the n-count
    * window reuses its exchange) — per-source, never global. */
  def rankNormalize(s: SparkSession, dir: String): DataFrame = {
    val score = docQualityStats(s, dir).select(
      col("doc_id"), col("source"),
      (when(col("n_tok") === 0, lit(0L))
        .otherwise(expr("n_distinct * 1000000 div n_tok")) +
        when(col("n_tok") === 0, lit(0L))
          .otherwise(expr("stop_hits * 1000000 div n_tok"))).as("score_ppm"))
    val w = Window.partitionBy("source")
      .orderBy(col("score_ppm").asc, col("doc_id").asc)
    score.withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .select(col("doc_id"), col("source"), col("score_ppm"), col("r"),
        when(col("n") > 1, expr("(r - 1) * 1000000 div (n - 1)"))
          .otherwise(lit(0L)).as("pct_ppm"))
      .orderBy("doc_id")
  }

  def qualityRules(s: SparkSession, dir: String): DataFrame = {
    val perDoc = docQualityStats(s, dir)
    val v = perDoc.select(
      col("source"),
      (col("n_tok") < MinTokens || col("n_tok") > MaxTokens).cast("long")
        .as("v_len"),
      (col("tok_chars") < lit(3) * col("n_tok") ||
        col("tok_chars") > lit(10) * col("n_tok")).cast("long")
        .as("v_wordlen"),
      (col("stop_hits") < 2).cast("long").as("v_stop"),
      (col("n_distinct") * 5 < col("n_tok")).cast("long").as("v_distinct"),
      (col("max_run") > MaxRun).cast("long").as("v_maxrun"))
    v.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("v_len") + col("v_wordlen") + col("v_stop") +
          col("v_distinct") + col("v_maxrun") === 0, 1L).otherwise(0L))
          .as("n_pass"),
        sum("v_len").as("v_len"),
        sum("v_wordlen").as("v_wordlen"),
        sum("v_stop").as("v_stop"),
        sum("v_distinct").as("v_distinct"),
        sum("v_maxrun").as("v_maxrun"))
      .orderBy("source")
  }

  // -------------------------------------------------------------- q106

  /** Calibration quantile count (deciles). */
  val CalibQuantiles = 10L

  /** Per-source quality-score calibration (q106): exact decile
    * boundaries of a per-doc quality score WITHIN each source — the
    * table a curation pipeline thresholds against ("keep each
    * source's top 30 %") instead of one global cutoff that a verbose
    * source would dominate (the CCNet/RefinedWeb per-bucket
    * discipline). The score is rule-aligned with q82 by construction:
    * distinct-token ppm + stopword ppm over the SAME
    * [[docQualityStats]] frame.
    *
    * Exact quantiles at 100 TB without a per-source sort: the score
    * is integer ppm with a bounded range, so the corpus first
    * collapses to a (source, score) HISTOGRAM via hash aggregation —
    * the only corpus-sized pass, map-side combining — and the decile
    * boundary d is min{score : cum(score)·10 ≥ d·n} computed by a
    * cumulative window over the histogram, whose partition size is
    * bounded by the VALUE RANGE (≤ 2·10⁶ rows per source) no matter
    * how many documents a source has. A doc-level ntile would sort
    * each source in one task; the histogram form is the same answer
    * with a bounded window. */
  def qualityCalibration(s: SparkSession, dir: String): DataFrame = {
    val score = docQualityStats(s, dir).select(
      col("source"),
      (when(col("n_tok") === 0, lit(0L))
        .otherwise(expr("n_distinct * 1000000 div n_tok")) +
        when(col("n_tok") === 0, lit(0L))
          .otherwise(expr("stop_hits * 1000000 div n_tok"))).as("score_ppm"))
    val hist = score.groupBy("source", "score_ppm")
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum("c").over(
        Window.partitionBy("source").orderBy("score_ppm")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(Window.partitionBy("source")))
    cum
      .select(col("source"), col("score_ppm"), col("cum"), col("n"),
        explode(sequence(lit(1L), lit(CalibQuantiles))).as("decile"))
      .where(col("cum") * CalibQuantiles >= col("decile") * col("n"))
      .groupBy("source", "decile")
      .agg(min("score_ppm").as("q_ppm"), min("n").as("n_docs"))
      .orderBy("source", "decile")
  }

  // -------------------------------------------------------------- q108

  /** Curation-funnel census (q108): the per-source survivorship
    * report a pipeline owner reads before training — how many
    * documents survive each curation stage CUMULATIVELY, and how many
    * tokens the final cut keeps. Stages, in pipeline order, each
    * defined by the operator that already owns it (no re-derivation,
    * so this census can never disagree with the stages themselves):
    *   1. `n_lang`      — langid agrees with the labeled language
    *                      (q26's predictor);
    *   2. `n_quality`   — all five q82 rules pass;
    *   3. `n_canonical` — the doc is its near-dup cluster's canonical
    *                      representative (q91's keep rule);
    *   4. `n_clean`     — not flagged by benchmark decontamination
    *                      (q54); `tok_kept` sums surviving tokens.
    *
    * Scale shape: each stage frame is one already-audited pipeline
    * (their plans carry their own shuffle budgets); the census itself
    * adds only doc_id equi-joins and one per-source hash aggregation.
    * The oracle splices the four stages' shared CTE chains
    * ([[TextAnalysis.langPredCtes]], [[qualityDocCtes]],
    * [[graft.ops.Dedup.canonicalRankCtes]],
    * [[graft.ops.DataPrep.contamCtes]]) into one statement, so the
    * green row certifies the COMPOSITION, not just each stage. */
  def curationFunnel(s: SparkSession, dir: String): DataFrame = {
    val lang = TextAnalysis.langId(s, dir)
      .select(col("doc_id"), col("is_match").as("lang_ok"))
    val canon = Dedup.erCanonical(s, dir)
      .select(col("doc_id"), col("is_canonical"))
    val contam = DataPrep.decontaminate(s, dir)
      .select(col("doc_id"), lit(1L).as("contaminated"))
    val qual = docQualityStats(s, dir).select(
      col("doc_id"), col("source"), col("n_tok"),
      (col("n_tok") >= MinTokens && col("n_tok") <= MaxTokens &&
        col("tok_chars") >= lit(3) * col("n_tok") &&
        col("tok_chars") <= lit(10) * col("n_tok") &&
        col("stop_hits") >= 2 &&
        col("n_distinct") * 5 >= col("n_tok") &&
        col("max_run") <= MaxRun).cast("long").as("qual_ok"))
    // Join strategy measured round 13: shuffle_hash hints on all
    // three funnel joins were tried and REJECTED — isolated min-of-7
    // 3.42 s (SMJ, AQE-decided) vs 4.02 s (hinted SHJ) at sf0.1/32
    // threads, comparable canaries. The doc-keyed sort is not the
    // bottleneck; the funnel's cost is its four component pipelines.
    qual.join(lang, "doc_id").join(canon, "doc_id")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("clean_ok",
        when(col("contaminated").isNull, 1L).otherwise(0L))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("lang_ok")).as("n_lang"),
        sum(col("lang_ok") * col("qual_ok")).as("n_quality"),
        sum(col("lang_ok") * col("qual_ok") * col("is_canonical"))
          .as("n_canonical"),
        sum(col("lang_ok") * col("qual_ok") * col("is_canonical") *
          col("clean_ok")).as("n_clean"),
        sum(col("lang_ok") * col("qual_ok") * col("is_canonical") *
          col("clean_ok") * col("n_tok")).as("tok_kept"))
      .orderBy("source")
  }

  // -------------------------------------------------------------- q83
  /** Content-defined chunking + chunk-level dedup stats per source.
    *
    * Boundary rule: position 1, or wordHash(token) ≡ 0 (mod ChunkMod)
    * — the token-level analogue of Rabin-fingerprint CDC, giving
    * ~ChunkMod-token expected chunks that realign after insertions
    * (the property fixed-width shingles lack). A chunk INSTANCE is
    * "duplicated" when its md5 occurs ≥ 2 times corpus-wide. */
  private val ChunkMod = 8L

  def cdcChunkDedup(s: SparkSession, dir: String): DataFrame = {
    val chunks = chunkExplode(
      Tables.documents(s, dir).select(col("source"), col("text")))
      .select("source", "chunk_hash")
    val counts = chunks.groupBy("chunk_hash")
      .agg(count(lit(1)).as("cnt"))
    chunks.join(counts, "chunk_hash")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_hash")).as("n_distinct_chunks"),
        sum((col("cnt") >= 2).cast("long")).as("n_dup_instances"))
      .withColumn("dup_ppm",
        expr("n_dup_instances * 1000000 div n_chunks"))
      .orderBy("source")
  }

  // -------------------------------------------------------------- q94
  /** Paragraph-level dedup (q94): the production step BETWEEN q44's
    * whole-document dedup and q74's duplication *measurement* — split
    * every document into q83's content-defined chunks, keep only the
    * corpus-wide FIRST occurrence of each chunk (order: doc_id, then
    * position within the doc), and re-emit the document with its
    * duplicated chunks removed (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better" — applied at chunk
    * granularity).
    *
    * Scale shape: chunk boundaries are per-row array lambdas (one
    * codegen pass); first-occurrence is ONE rank window over the
    * chunk_hash exchange — the same bucketed-store exchange q83
    * argues for; reassembly is one groupBy(doc_id) whose per-doc
    * surviving chunks ride a sorted collect_list (bounded by document
    * length, which the corpus contract already bounds). No pairwise
    * anything: a chunk duplicated a million times costs one window
    * partition of a million rows, the same key the dedup store would
    * hash anyway — and a skew-capped variant would salt exactly that
    * key. */
  def paragraphDedup(s: SparkSession, dir: String): DataFrame = {
    val chunks = chunkExplode(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .select("doc_id", "pos", "chunk", "chunk_hash")
    val wFirst = Window.partitionBy("chunk_hash")
      .orderBy(col("doc_id").asc, col("pos").asc)
    chunks
      .withColumn("rn", row_number().over(wFirst))
      .withColumn("kept",
        when(col("rn") === 1, struct(col("pos"), col("chunk"))))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum((col("rn") === 1).cast("long")).as("n_kept"),
        array_join(transform(array_sort(collect_list(col("kept"))),
          e => e.getField("chunk")), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Output/scratch column names [[chunkExplode]] reserves. */
  private val ChunkReserved =
    Seq("pos", "col", "chunk", "chunk_hash", "_graft_chunk_ts")

  /** The CDC chunker as a reusable projection: rows with non-empty
    * `text` explode to one row per chunk, keeping every other input
    * column (`pos` 0-based within the doc, `chunk` the token-joined
    * text, `chunk_hash` its md5). Stateless per-row kernels only, so
    * it applies to a STREAMING DataFrame unchanged —
    * [[graft.streaming.StreamingChunkDedup]] runs exactly this
    * projection in front of its watermark-bounded state (with its
    * event-time column riding through untouched). Fails fast if an
    * input column collides with a reserved output name — silently
    * shadowing a caller's `pos` or event-time column would corrupt
    * downstream watermarks. */
  private[graft] def chunkExplode(docs: DataFrame): DataFrame = {
    val clash = docs.columns.filter(ChunkReserved.contains)
    require(clash.isEmpty,
      s"chunkExplode reserves column name(s) ${clash.mkString(", ")} — " +
        "rename the input column(s)")
    val ts = col("_graft_chunk_ts")
    val n = size(ts)
    val bpos = filter(sequence(lit(1), n), i =>
      i === 1 ||
        TextAnalysis.wordHash(element_at(ts, i)) % ChunkMod === 0)
    val nextb = concat(
      slice(bpos, lit(2), greatest(size(bpos) - 1, lit(0))), array(n + 1))
    docs
      .filter(length(trim(col("text"))) > 0)
      .withColumn("_graft_chunk_ts", words(col("text")))
      .select(col("*"), posexplode(zip_with(bpos, nextb, (a, b) =>
        array_join(slice(ts, a, b - a), " "))))
      .withColumnRenamed("col", "chunk")
      .withColumn("chunk_hash", md5(col("chunk")))
      .drop("_graft_chunk_ts")
  }

  // -------------------------------------------------------------- q100
  /** Cross-source overlap matrix (q100): for every source pair, how
    * many distinct content chunks they share — the provenance
    * diagnostic behind train/test leakage checks (q54 decontaminates
    * against ONE eval set; this surveys every subset against every
    * other) and dataset-mixing decisions (two crawls that overlap 80%
    * should not both get full weight).
    *
    * Shape: distinct (chunk_hash, source) pairs, self-joined on
    * chunk_hash, counted per source pair; `overlap_milli` scales the
    * shared count by the SMALLER source's distinct-chunk count (the
    * containment convention of q99 at source granularity). A chunk
    * shared by k sources emits k(k−1)/2 pairs — bounded by the source
    * count squared, and sources are a curated enum (dozens to
    * hundreds), not data-scale; the chunk_hash exchange itself is
    * q83's. */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val hs = chunkExplode(
      Tables.documents(s, dir).select(col("source"), col("text")))
      .select("chunk_hash", "source").distinct()
    val perSrc = hs.groupBy("source")
      .agg(count(lit(1)).as("n_chunks"))
    val shared = hs.as("x")
      .join(hs.as("y"), Seq("chunk_hash"))
      .where(col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("shared_chunks"))
    shared
      .join(perSrc.select(col("source").as("src_a"), col("n_chunks").as("na")),
        Seq("src_a"))
      .join(perSrc.select(col("source").as("src_b"), col("n_chunks").as("nb")),
        Seq("src_b"))
      .withColumn("overlap_milli",
        round(col("shared_chunks") * lit(1000.0) /
          least(col("na"), col("nb"))).cast("long"))
      .select("src_a", "src_b", "shared_chunks", "na", "nb", "overlap_milli")
      .orderBy("src_a", "src_b")
  }

  // -------------------------------------------------------------- q101
  /** Deterministic incoming-batch share (md5 bucket < 10 of 100). */
  private[ops] val IncomingPct = 10L
  /** Chunk-overlap keep bar: an incoming doc with ≥ this ‰ of its
    * chunks already in the store is dropped. */
  private[ops] val IncDupMilliMax = 500L

  /** Incremental dedup (q101): the job a corpus pipeline actually runs
    * every day — dedup the NEWLY ARRIVED batch against the existing
    * store, not the whole corpus against itself. The harness carves a
    * deterministic 10% "today" batch out of `documents` by md5 bucket
    * (the q48 split machinery); each incoming doc is checked (a)
    * exactly — content hash against the store's hashes AND against
    * earlier docs in the same batch (keep-min on doc_id, q44's
    * convention; without the intra-batch clause two copies of a page
    * crawled twice today would both pass) — and (b) at chunk
    * granularity, the fraction of its CDC chunks already present in
    * the store; kept iff not an exact dup and chunk overlap <
    * [[IncDupMilliMax]]‰. (Within-batch CHUNK-level dedup is q94 run
    * over the batch — a different output contract.)
    *
    * The plan shape is the POINT, and it is the opposite of the
    * global dedups: q44/q94 shuffle the whole corpus on content keys,
    * while here the probe side (one day's crawl) is orders of
    * magnitude smaller than the store — the joins hash on
    * content/chunk keys with the small side broadcast-able, the store
    * side streaming through at scan speed, and nothing global is
    * re-sorted or re-clustered. At petabyte store sizes the
    * chunk-hash membership join is the one a bucketed store answers
    * by co-located lookup (or a q85-style bloom pre-filter — compose
    * `Pruning.bloomFilterAgg` over the store's chunk hashes when the
    * store side cannot be joined directly). */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("bucket", Det.h8(col("doc_id").cast("string")) % 100)
    val incoming = docs.filter(col("bucket") < IncomingPct)
      .select("doc_id", "text")
    val store = docs.filter(col("bucket") >= IncomingPct)
    val storeContent = store.select(md5(col("text")).as("content_hash"))
      .distinct()
    // exact: in the store, OR a later copy WITHIN the batch (keep-min
    // on doc_id, q44's convention) — without the second clause, two
    // copies of a page crawled twice today would both pass and the
    // duplication q44 prevents would re-enter via the daily path
    val wBatch = Window.partitionBy("content_hash").orderBy(col("doc_id").asc)
    val exact = incoming
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("batch_rn", row_number().over(wBatch))
      .join(storeContent.withColumn("hit", lit(1L)),
        Seq("content_hash"), "left")
      .select(col("doc_id"),
        (coalesce(col("hit"), lit(0L)) === 1L || col("batch_rn") > 1)
          .cast("long").as("exact_dup"))
    val incChunks = chunkExplode(incoming)
      .select("doc_id", "chunk_hash").distinct()
    val storeChunks = chunkExplode(store.select(col("text")))
      .select("chunk_hash").distinct()
    val overlap = incChunks
      .join(storeChunks.withColumn("hit", lit(1L)), Seq("chunk_hash"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("hit"), lit(0L))).as("n_store_dup"))
      .withColumn("dup_milli", expr("n_store_dup * 1000 div n_chunks"))
    // exact already carries one row per incoming doc — no join back
    // onto the incoming frame needed
    exact
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_dup"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_store_dup"), lit(0L)).as("n_store_dup"),
        coalesce(col("dup_milli"), lit(0L)).as("dup_milli"))
      .withColumn("keep",
        (col("exact_dup") === 0 &&
          col("dup_milli") < IncDupMilliMax).cast("long"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------- q84
  /** Deterministic per-source sample: the k docs with the smallest
    * md5(doc_id) per source — an unbiased, reproducible "random"
    * sample (md5 is uniform, keyed only by doc_id, stable across
    * engines and runs — no RNG seed to disagree on). */
  private val SampleK = 5

  def perSourceSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= SampleK)
      .select("source", "rk", "doc_id", "n_chars")
      .orderBy("source", "rk")
  }

  // -------------------------------------------------------------- q97
  /** Per-source token budget for the curation sieve — roughly half of
    * a harness source's total tokens, so the sieve visibly selects
    * (the production value is whatever the mixing plan allocates). */
  private[ops] val TokenBudget = 700L

  /** Token-budget curation (q97): each source contributes its
    * best-quality documents until a fixed token budget is spent — the
    * mixing-under-budget step between corpus scoring and training-set
    * assembly. Documents are ranked per source by the q25 integer
    * quality score (tie-break doc_id), and a document is kept iff the
    * running token sum THROUGH it stays ≤ [[TokenBudget]] — a
    * prefix cutoff. The budget is honored STRICTLY: an oversized
    * top-quality document exhausts its source's budget by itself
    * (every later cumulative sum is larger still). The skip-and-
    * continue variant is a sequential-dependent knapsack that no
    * longer maps onto one window; a pipeline wanting it bounds
    * document length upstream (q82's MaxTokens rule) before
    * budgeting.
    *
    * Scale shape: the quality kernel is q25's per-row expressions at
    * scan speed; the sieve is ONE running-sum window per source key —
    * the same single exchange any per-source rank takes. Sources are
    * the partition key, so a 100-TB corpus with thousands of sources
    * parallelizes across them; no global sort, no driver state. */
  def tokenBudgetCurate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("quality_milli").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TextAnalysis.docStatsCols(Tables.documents(s, dir))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("quality_milli"))
      .withColumn("cum_tokens", sum("n_tokens").over(w).cast("long"))
      .filter(col("cum_tokens") <= TokenBudget)
      .orderBy("source", "doc_id")
  }

  // ------------------------------------------------------------- q112
  /** Sliding-window geometry: 64-token windows every 48 tokens (16
    * tokens of overlap) — the fixed-stride retrieval-chunking default;
    * production swaps the constants, not the shape. */
  private[ops] val ChunkWin = 64
  private[ops] val ChunkStride = 48

  /** Fixed-stride sliding-window chunking (q112) — the retrieval/
    * context-window complement to q83's content-defined chunks: every
    * document becomes ⌈n/stride⌉ overlapping windows of [[ChunkWin]]
    * tokens starting every [[ChunkStride]], the shape a RAG index or a
    * fixed-context pretokenizer consumes. Overlap keeps boundary
    * sentences inside at least one full window; CDC (q83) instead
    * aligns boundaries to content so edits re-chunk locally — a
    * pipeline typically runs BOTH (CDC for dedup, sliding for
    * retrieval).
    *
    * Determinism: the pinned [[Det.WsClass]] tokenizer, integer start
    * offsets from `sequence(0, n−1, stride)` (mirrored by DuckDB's
    * exclusive-end `range(0, n, stride)`), and the chunk digest is
    * [[Det.h8]] of the space-rejoined window — both engines hash the
    * identical byte string.
    *
    * Scale shape: per-row tokenize + explode of ≤ ⌈n/stride⌉ offsets —
    * map-side only (the explode multiplies rows ~n/stride ≈ 1.33×,
    * nothing like a join); the single exchange is the output's
    * (doc_id, chunk_idx) sort. Chunk rows carry the digest and
    * geometry, not the window text — at 100 TB the chunk INDEX is what
    * ships to the ANN/retrieval layer, and a consumer that wants bytes
    * re-slices the one doc it fetched. */
  def slidingChunks(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), Det.words(col("text")).as("ts"))
    toks
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(0), size(col("ts")) - 1,
          lit(ChunkStride))).as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / ChunkStride).cast("long").as("chunk_idx"),
        col("start_tok").cast("long"),
        slice(col("ts"), col("start_tok") + 1, lit(ChunkWin)).as("ck"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ck")).cast("long").as("chunk_tokens"),
        Det.h8(concat_ws(" ", col("ck"))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  // ---------------------------------------------------------------- q155
  /** Tokens that define a document's opening signature, and how many
    * documents must share one before it counts as a template. */
  val OpeningTokens = 2
  val TemplateMinDocs = 2L

  /** q155: template openings — documents grouped by their first
    * [[OpeningTokens]] tokens; openings shared by ≥ [[TemplateMinDocs]]
    * docs are template candidates (machine-generated pages, form
    * letters, scraper artifacts open identically). Reported with the
    * doc count, how many SOURCES the template spans (cross-source ⇒
    * scraper boilerplate, single-source ⇒ a site template), and the
    * smallest doc id as the inspectable example.
    *
    * Scale shape: the signature is a per-row prefix slice (no
    * explode — openings are O(docs) rows of ~2 tokens), then ONE
    * hash agg on the opening string; the distinct-source count rides
    * the same exchange as an Expand. Docs shorter than the signature
    * can't claim a template and are excluded by both engines. */
  def templateOpenings(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), words(col("text")).as("ts"))
      .filter(size(col("ts")) >= OpeningTokens)
      .select(col("doc_id"), col("source"),
        array_join(slice(col("ts"), 1, OpeningTokens), " ").as("opening"))
      .groupBy("opening")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct("source").cast("long").as("n_sources"),
        min("doc_id").cast("long").as("example_doc"))
      .filter(col("n_docs") >= TemplateMinDocs)
      .orderBy("opening")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_template_openings" -> (templateOpenings _),
    "q112_sliding_chunks" -> (slidingChunks _),
    "q82_quality_rules" -> (qualityRules _),
    "q106_quality_calibration" -> (qualityCalibration _),
    "q126_rank_normalize" -> (rankNormalize _),
    "q108_curation_funnel" -> (curationFunnel _),
    "q83_cdc_chunk_dedup" -> (cdcChunkDedup _),
    "q84_source_sample" -> (perSourceSample _),
    "q94_paragraph_dedup" -> (paragraphDedup _),
    "q97_token_budget" -> (tokenBudgetCurate _),
    "q100_source_overlap" -> (sourceOverlap _),
    "q101_incremental_dedup" -> (incrementalDedup _)
  )

  private val stopList = StopWords.map(w => s"'$w'").mkString(", ")

  /** The CDC chunk CTE chain over `from` (which must expose `text`):
    * emits `${p}tok` / `${p}b` / `${p}ch`, where `${p}ch` carries the
    * `keep` columns + 1-based `pos` + the chunk text. The SQL mirror
    * of [[chunkExplode]] — ONE definition of the boundary rule for
    * every oracle that chunks (q83/q94/q100/q101); a per-oracle copy
    * that drifted would silently break engine equivalence. */
  private def chunkCtesSql(from: String, keep: Seq[String],
      p: String = ""): String = {
    val k = keep.map(_ + ", ").mkString
    s"""${p}tok AS (
       | SELECT ${k}string_split_regex(trim(text), '${Det.WsClass}+') AS ts
       | FROM $from WHERE len(trim(text)) > 0),
       |${p}b AS (
       | SELECT ${k}ts,
       |  list_filter(generate_series(1, len(ts)), i -> i = 1 OR
       |    ${Det.h8Sql("ts[i]")} % $ChunkMod = 0) AS bpos
       | FROM ${p}tok),
       |${p}ch AS (
       | SELECT ${k}j AS pos, array_to_string(
       |    ts[bpos[j] : coalesce(bpos[j+1], len(ts) + 1) - 1],
       |    ' ') AS chunk
       | FROM ${p}b, UNNEST(generate_series(1, len(bpos))) AS t(j))""".stripMargin
  }

  /** The per-doc quality-stats CTE chain (tok → runs → mr), the SQL
    * mirror of [[docQualityStats]] — shared prefix of the q82 and
    * q106 oracles so both engines agree on ONE stats definition. */
  private lazy val qualityDocCtes: String =
    s"""WITH tok AS (
       | SELECT doc_id, source,
       |  string_split_regex(trim(text), '${Det.WsClass}+') AS ts,
       |  CASE WHEN len(trim(text)) = 0 THEN 0
       |       ELSE len(string_split_regex(trim(text), '${Det.WsClass}+')) END AS n_tok,
       |  len(regexp_replace(text, '${Det.WsClass}', '', 'g')) AS tok_chars
       | FROM documents),
       |runs AS (
       | SELECT *,
       |  len(list_distinct(ts)) AS n_distinct,
       |  len(list_filter(ts, w -> w IN ($stopList))) AS stop_hits,
       |  list_filter(generate_series(1, len(ts)),
       |    i -> i = 1 OR ts[i] <> ts[i-1]) AS bpos
       | FROM tok),
       |mr AS (
       | SELECT doc_id, source, n_tok, tok_chars, n_distinct, stop_hits,
       |  CASE WHEN len(ts) = 0 THEN 0 ELSE coalesce(list_max(
       |    list_transform(generate_series(1, len(bpos)), j ->
       |      coalesce(bpos[j+1], len(ts) + 1) - bpos[j])), 0)
       |  END AS max_run
       | FROM runs)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q155_template_openings" ->
      s"""WITH t AS (
         | SELECT doc_id, source, ${Det.wordsSql("text")} AS ts FROM documents),
         |b AS (
         | SELECT doc_id, source,
         |  array_to_string(ts[1:$OpeningTokens], ' ') AS opening
         | FROM t WHERE len(ts) >= $OpeningTokens),
         |g AS (
         | SELECT opening, count(*) AS n_docs,
         |  count(DISTINCT source) AS n_sources, min(doc_id) AS example_doc
         | FROM b GROUP BY opening)
         |SELECT opening, CAST(n_docs AS BIGINT) AS n_docs,
         | CAST(n_sources AS BIGINT) AS n_sources,
         | CAST(example_doc AS BIGINT) AS example_doc
         |FROM g WHERE n_docs >= $TemplateMinDocs ORDER BY opening""".stripMargin,
    "q112_sliding_chunks" ->
      s"""WITH t AS (
         | SELECT doc_id, string_split_regex(trim(text), '${Det.WsClass}+') AS ts
         | FROM documents WHERE trim(text) != ''),
         |st AS (
         | SELECT doc_id, ts, unnest(range(0, len(ts), $ChunkStride)) AS start_tok
         | FROM t),
         |ck AS (
         | SELECT doc_id,
         |  CAST(start_tok // $ChunkStride AS BIGINT) AS chunk_idx,
         |  CAST(start_tok AS BIGINT) AS start_tok,
         |  ts[start_tok + 1 : start_tok + $ChunkWin] AS ckl
         | FROM st)
         |SELECT doc_id, chunk_idx, start_tok,
         | CAST(len(ckl) AS BIGINT) AS chunk_tokens,
         | ${Det.h8Sql("array_to_string(ckl, ' ')")} AS chunk_hash
         |FROM ck ORDER BY doc_id, chunk_idx""".stripMargin,
    "q82_quality_rules" ->
      s"""$qualityDocCtes,
         |flags AS (
         | SELECT source,
         |  CASE WHEN n_tok < $MinTokens OR n_tok > $MaxTokens
         |       THEN 1 ELSE 0 END AS v_len,
         |  CASE WHEN tok_chars < 3 * n_tok OR tok_chars > 10 * n_tok
         |       THEN 1 ELSE 0 END AS v_wordlen,
         |  CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END AS v_stop,
         |  CASE WHEN n_distinct * 5 < n_tok THEN 1 ELSE 0 END AS v_distinct,
         |  CASE WHEN max_run > $MaxRun THEN 1 ELSE 0 END AS v_maxrun
         | FROM mr)
         |SELECT source, count(*) AS n_docs,
         | CAST(sum(CASE WHEN v_len + v_wordlen + v_stop + v_distinct
         |   + v_maxrun = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         | CAST(sum(v_len) AS BIGINT) AS v_len,
         | CAST(sum(v_wordlen) AS BIGINT) AS v_wordlen,
         | CAST(sum(v_stop) AS BIGINT) AS v_stop,
         | CAST(sum(v_distinct) AS BIGINT) AS v_distinct,
         | CAST(sum(v_maxrun) AS BIGINT) AS v_maxrun
         |FROM flags GROUP BY source ORDER BY source""".stripMargin,
    "q106_quality_calibration" ->
      s"""$qualityDocCtes,
         |sc AS (
         | SELECT source,
         |  (CASE WHEN n_tok = 0 THEN 0
         |        ELSE ${OracleSql.ppmSql("n_distinct", "n_tok")} END) +
         |  (CASE WHEN n_tok = 0 THEN 0
         |        ELSE ${OracleSql.ppmSql("stop_hits", "n_tok")} END) AS score_ppm
         | FROM mr),
         |h AS (SELECT source, score_ppm, count(*) AS c FROM sc GROUP BY 1, 2),
         |cu AS (
         | SELECT source, score_ppm, c,
         |  CAST(sum(c) OVER (PARTITION BY source ORDER BY score_ppm
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |  CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
         | FROM h),
         |x AS (
         | SELECT source, score_ppm, cum, n,
         |  unnest(generate_series(1, $CalibQuantiles)) AS decile
         | FROM cu)
         |SELECT source, CAST(decile AS BIGINT) AS decile,
         | min(score_ppm) AS q_ppm, min(n) AS n_docs
         |FROM x WHERE cum * $CalibQuantiles >= decile * n
         |GROUP BY 1, 2 ORDER BY source, decile""".stripMargin,
    "q126_rank_normalize" ->
      s"""$qualityDocCtes,
         |sc AS (
         | SELECT doc_id, source,
         |  (CASE WHEN n_tok = 0 THEN 0
         |        ELSE ${OracleSql.ppmSql("n_distinct", "n_tok")} END) +
         |  (CASE WHEN n_tok = 0 THEN 0
         |        ELSE ${OracleSql.ppmSql("stop_hits", "n_tok")} END) AS score_ppm
         | FROM mr),
         |r AS (
         | SELECT doc_id, source, CAST(score_ppm AS BIGINT) AS score_ppm,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY score_ppm, doc_id) AS BIGINT) AS r,
         |  count(*) OVER (PARTITION BY source) AS n
         | FROM sc)
         |SELECT doc_id, source, score_ppm, r,
         | CASE WHEN n > 1 THEN ${OracleSql.ppmSql("(r - 1)", "(n - 1)")}
         |      ELSE CAST(0 AS BIGINT) END AS pct_ppm
         |FROM r ORDER BY doc_id""".stripMargin,
    // one statement splicing the four stage chains; `ranked`'s local
    // alias `d` for documents shadows the contamination chain's `d`
    // CTE only inside that subquery — both engines scope it the same
    "q108_curation_funnel" ->
      s"""${Dedup.canonicalRankCtes},
         |${TextAnalysis.langPredCtes},
         |${qualityDocCtes.stripPrefix("WITH ")},
         |${DataPrep.contamCtes},
         |census AS (
         | SELECT mr.doc_id, mr.source, mr.n_tok,
         |  CAST(lp.predicted = lp.lang AS BIGINT) AS lang_ok,
         |  CASE WHEN mr.n_tok >= $MinTokens AND mr.n_tok <= $MaxTokens
         |        AND mr.tok_chars >= 3 * mr.n_tok
         |        AND mr.tok_chars <= 10 * mr.n_tok
         |        AND mr.stop_hits >= 2 AND mr.n_distinct * 5 >= mr.n_tok
         |        AND mr.max_run <= $MaxRun THEN 1 ELSE 0 END AS qual_ok,
         |  CASE WHEN r.rk = 1 THEN 1 ELSE 0 END AS canon_ok,
         |  CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END AS clean_ok
         | FROM mr
         | JOIN lpred lp ON lp.doc_id = mr.doc_id
         | JOIN ranked r ON r.doc_id = mr.doc_id
         | LEFT JOIN contam c ON c.doc_id = mr.doc_id)
         |SELECT source, count(*) AS n_docs,
         | CAST(sum(lang_ok) AS BIGINT) AS n_lang,
         | CAST(sum(lang_ok * qual_ok) AS BIGINT) AS n_quality,
         | CAST(sum(lang_ok * qual_ok * canon_ok) AS BIGINT) AS n_canonical,
         | CAST(sum(lang_ok * qual_ok * canon_ok * clean_ok) AS BIGINT)
         |   AS n_clean,
         | CAST(sum(lang_ok * qual_ok * canon_ok * clean_ok * n_tok)
         |   AS BIGINT) AS tok_kept
         |FROM census GROUP BY source ORDER BY source""".stripMargin,
    "q83_cdc_chunk_dedup" ->
      s"""WITH ${chunkCtesSql("documents", Seq("source"))},
         |chunks AS (SELECT source, md5(chunk) AS chunk_hash FROM ch),
         |counts AS (
         | SELECT chunk_hash, count(*) AS cnt FROM chunks GROUP BY 1)
         |SELECT source,
         | count(*) AS n_chunks,
         | count(DISTINCT c.chunk_hash) AS n_distinct_chunks,
         | CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_dup_instances,
         | CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) * 1000000
         |   // count(*) AS BIGINT) AS dup_ppm
         |FROM chunks c JOIN counts USING (chunk_hash)
         |GROUP BY source ORDER BY source""".stripMargin,
    "q94_paragraph_dedup" ->
      s"""WITH ${chunkCtesSql("documents", Seq("doc_id"))},
         |r AS (
         | SELECT doc_id, pos, chunk,
         |  row_number() OVER (PARTITION BY md5(chunk)
         |    ORDER BY doc_id, pos) AS rn
         | FROM ch)
         |SELECT doc_id, count(*) AS n_chunks,
         | CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
         |   ORDER BY pos), '') AS clean_text
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q101_incremental_dedup" ->
      s"""WITH d AS (
         | SELECT doc_id, text,
         |  ${Det.h8Sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         | FROM documents),
         |inc AS (SELECT doc_id, text FROM d WHERE bucket < $IncomingPct),
         |store AS (SELECT doc_id, text FROM d WHERE bucket >= $IncomingPct),
         |sc AS (SELECT DISTINCT md5(text) AS content_hash FROM store),
         |ex AS (SELECT doc_id,
         |  CASE WHEN md5(text) IN (SELECT content_hash FROM sc)
         |        OR row_number() OVER (PARTITION BY md5(text)
         |             ORDER BY doc_id) > 1
         |       THEN 1 ELSE 0 END AS exact_dup FROM inc),
         |${chunkCtesSql("inc", Seq("doc_id"), "i")},
         |ic AS (SELECT DISTINCT doc_id, md5(chunk) AS chunk_hash FROM ich),
         |${chunkCtesSql("store", Seq(), "s")},
         |stc AS (SELECT DISTINCT md5(chunk) AS chunk_hash FROM sch),
         |ov AS (SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN chunk_hash IN (SELECT chunk_hash FROM stc)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_store_dup
         | FROM ic GROUP BY doc_id)
         |SELECT ex.doc_id, CAST(exact_dup AS BIGINT) AS exact_dup,
         | coalesce(n_chunks, 0) AS n_chunks,
         | coalesce(n_store_dup, 0) AS n_store_dup,
         | coalesce(n_store_dup * 1000 // n_chunks, 0) AS dup_milli,
         | CAST(exact_dup = 0 AND
         |   coalesce(n_store_dup * 1000 // n_chunks, 0) < $IncDupMilliMax
         |   AS BIGINT) AS keep
         |FROM ex LEFT JOIN ov ON ov.doc_id = ex.doc_id
         |ORDER BY ex.doc_id""".stripMargin,
    "q100_source_overlap" ->
      s"""WITH ${chunkCtesSql("documents", Seq("source"))},
         |hs AS (SELECT DISTINCT source, md5(chunk) AS chunk_hash FROM ch),
         |per_src AS (SELECT source, count(*) AS n_chunks FROM hs GROUP BY 1),
         |shared AS (
         | SELECT x.source AS src_a, y.source AS src_b,
         |  count(*) AS shared_chunks
         | FROM hs x JOIN hs y ON x.chunk_hash = y.chunk_hash
         |  AND x.source < y.source
         | GROUP BY 1, 2)
         |SELECT src_a, src_b, shared_chunks,
         | pa.n_chunks AS na, pb.n_chunks AS nb,
         | CAST(round(1000.0 * shared_chunks /
         |   least(pa.n_chunks, pb.n_chunks)) AS BIGINT) AS overlap_milli
         |FROM shared
         |JOIN per_src pa ON pa.source = shared.src_a
         |JOIN per_src pb ON pb.source = shared.src_b
         |ORDER BY src_a, src_b""".stripMargin,
    "q97_token_budget" ->
      s"""WITH st AS (
         | SELECT source, doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN 0
         |       ELSE len(${Det.wordsSql("text")}) END AS n_tokens,
         |  len(list_filter(${Det.wordsSql("text")},
         |      x -> x IN ($stopList))) AS stop_hits
         | FROM documents),
         |q AS (
         | SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CASE WHEN n_tokens > 0
         |       THEN CAST(round(stop_hits * 1000.0 / n_tokens) AS BIGINT)
         |       ELSE 0 END AS quality_milli
         | FROM st),
         |c AS (
         | SELECT source, doc_id, n_tokens, quality_milli,
         |  CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY quality_milli DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         | FROM q)
         |SELECT source, doc_id, n_tokens, quality_milli, cum_tokens
         |FROM c WHERE cum_tokens <= $TokenBudget
         |ORDER BY source, doc_id""".stripMargin,
    "q84_source_sample" ->
      s"""WITH ranked AS (
         | SELECT doc_id, source, n_chars,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
         | FROM documents)
         |SELECT source, rk, doc_id, n_chars FROM ranked
         |WHERE rk <= $SampleK ORDER BY source, rk""".stripMargin
  )
}
