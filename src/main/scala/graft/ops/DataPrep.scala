package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data preparation operators (q47–q51): repetition-based
  * quality filtering, deterministic dataset splitting, tf-idf term
  * ranking, stratified sampling, and quantile feature binning.
  *
  * These are the ops a 100 TB pretraining pipeline runs between raw
  * ingest and tokenization. Design rules shared by all five:
  *   - integer arithmetic end-to-end (counts, integer division,
  *     md5-prefix hashing) so the DuckDB oracle hash-matches exactly —
  *     no floating-point round-off surface;
  *   - the heavy shapes are word-count aggregations (explode →
  *     two-level partial agg) and window functions, both of which scale
  *     linearly and keep partial aggregation on the map side;
  *   - sampling/splitting is a pure per-row projection on a content
  *     hash: deterministic, re-runnable, no shuffle at all.
  */
object DataPrep {

  private def words(c: Column): Column = Det.words(c)

  /** The cross-engine hash — one definition in [[Det.h8]]. */
  private def h8(c: Column): Column = Det.h8(c)

  /** Integer per-mille: (num * 1000) div den, 0 when den = 0. Both
    * operands are non-negative longs ≤ ~1e9·1000, exact in a double,
    * so floor(double-div) ≡ integer div in both engines. */
  private def perMille(num: Column, den: Column): Column =
    when(den === 0, lit(0L))
      .otherwise(floor(num * lit(1000L) / den)).cast("long")

  // ---- q47: repetition / quality stats (Gopher-style) ----------------

  /** Keep-thresholds (per-mille). A doc is kept when at most
    * `MaxDupTokenMilli`/1000 of its tokens are repeats of earlier
    * tokens AND its most frequent bigram is at most
    * `MaxTopBigramMilli`/1000 of all bigrams — the standard repetition
    * filters for boilerplate/spam (Gopher §A1.1 shape). */
  val MaxDupTokenMilli = 600L
  val MaxTopBigramMilli = 65L

  /** The top-bigram fraction is statistically meaningless on tiny docs
    * (1 bigram of 7 is already 142‰); the filter only applies to docs
    * with at least this many bigrams, as the length-guarded repetition
    * filters do. */
  val MinBigramsForFilter = 20L

  /** Per-document repetition statistics + keep flag (q47).
    *
    * Token/bigram top-frequencies are computed as distributed
    * word-count aggregations (explode → groupBy(doc, gram) →
    * groupBy(doc) max), NOT per-row higher-order loops: a per-row
    * `transform(distinct, count-occurrences)` is O(k·n) per document
    * and degenerates on a pathological 1 M-token doc, while the
    * two-level agg is linear with map-side partial aggregation. */
  def repetitionStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), words(coalesce(col("text"), lit(""))).as("w"))
    val base = d.select(
      col("doc_id"),
      when(length(concat_ws("", col("w"))) === 0, 0L)
        .otherwise(size(col("w"))).cast("long").as("n_tokens"),
      size(array_distinct(col("w"))).cast("long").as("n_distinct"),
      greatest(size(col("w")) - 1, lit(0)).cast("long").as("n_bigrams"))
    val topTok = d.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(max("count").as("top_token_count"))
    val bigrams = d.select(col("doc_id"),
      explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val topBg = bigrams
      .groupBy("doc_id", "bg").count()
      .groupBy("doc_id").agg(max("count").as("top_bigram_count"))
    base
      .join(topTok, Seq("doc_id"), "left")
      .join(topBg, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"), col("n_bigrams"),
        coalesce(col("top_token_count"), lit(0L)).as("top_token_count"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        perMille(col("n_tokens") - col("n_distinct"), col("n_tokens"))
          .as("dup_token_milli"),
        perMille(coalesce(col("top_bigram_count"), lit(0L)), col("n_bigrams"))
          .as("top_bigram_milli"))
      .withColumn("keep",
        (col("dup_token_milli") <= MaxDupTokenMilli &&
          (col("n_bigrams") < MinBigramsForFilter ||
            col("top_bigram_milli") <= MaxTopBigramMilli)).cast("long"))
      .orderBy("doc_id")
  }

  // ---- q48: deterministic train/val/test split -----------------------

  /** Hash-split bucket bounds (percent of the 100-bucket space). */
  val TrainPct = 80L
  val ValPct = 90L // buckets [80, 90) → val, [90, 100) → test

  /** Deterministic dataset split (q48): bucket = md5(doc_id) % 100.
    * Pure per-row projection — no shuffle, no RNG state, stable under
    * re-runs/retries and across cluster sizes, which is the property
    * that matters for a split (a `rand()` split changes membership on
    * every recompute and poisons eval sets). */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (h8(col("doc_id").cast("string")) % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainPct, "train")
          .when(col("bucket") < ValPct, "val")
          .otherwise("test"))
      .orderBy("doc_id")

  // ---- q49: tf-idf top terms per document ----------------------------

  val TfIdfTopK = 3

  /** Integer tf-idf (q49): score = tf · ((N·1000) div df), top-3 terms
    * per document, ties broken by term. The idf is integer-scaled
    * instead of a log so both engines agree bit-for-bit; the ranking
    * behavior (rare terms up-weighted) is the same.
    *
    * Shape: word-count agg for tf; df derived from tf by a second agg
    * (one row per (doc, term) already exists, so df = COUNT(*) per
    * term); N joined in as a broadcast 1-row aggregate — the whole
    * pipeline is three hash aggregations and one broadcast, no
    * driver-side scalars. */
  def tfIdfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .where(col("term") =!= "") // empty/ws-only docs: no phantom "" term
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * floor(col("n_docs") * lit(1000L) / col("df")).cast("long"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term").asc)))
      .filter(col("rnk") <= TfIdfTopK)
      .select("doc_id", "term", "tf", "df", "score", "rnk")
      .orderBy("doc_id", "rnk")
  }

  // ---- q50: stratified sampling --------------------------------------

  /** Per-stratum sample rates (per-mille). The overrepresented language
    * is downsampled hard; scarcer strata keep more — the standard
    * rebalancing move for a multilingual corpus. */
  val StratRates: Seq[(String, Long)] =
    Seq("en" -> 100L, "de" -> 250L, "es" -> 250L, "fr" -> 250L, "zh" -> 500L)

  /** Deterministic stratified sample (q50): keep a doc when
    * md5('strat:' ++ doc_id) % 1000 < rate(lang). The salt decorrelates
    * this membership from q48's split buckets (same hash on different
    * keys); unknown strata default to rate 0 (dropped). Per-row
    * projection + filter — shuffle-free, pushdown-friendly. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = StratRates.foldLeft(lit(0L)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        (h8(concat(lit("strat:"), col("doc_id").cast("string"))) % 1000)
          .as("bucket"))
      .filter(col("bucket") < rate)
      .orderBy("doc_id")
  }

  // ---- q51: quantile feature binning ---------------------------------

  val NBins = 10

  /** Decile feature binning (q51): ntile(10) of event value within each
    * event_type, tie-broken by event_id so the assignment is total and
    * deterministic. One shuffle on event_type + a sort within
    * partitions — at 100 TB the per-type sort is the cost, which is
    * exactly what a quantile binning must pay (or move to the GK-sketch
    * approximate binning of q40 when exact ranks aren't required). */
  def featureBins(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("bin", ntile(NBins).over(
        Window.partitionBy("event_type")
          .orderBy(col("value").asc_nulls_last, col("event_id").asc)))
      .select(col("event_id"), col("event_type"), col("bin").cast("long").as("bin"),
        Det.cents(col("value")).cast("long").as("value_cents"))
      .orderBy("event_id")

  // ---- q53: PII / log scrubbing --------------------------------------

  /** Redaction patterns, applied in this order (email before ip before
    * number, so the generic digit-run rule never eats the structured
    * matches first). The same literal strings are embedded in the
    * DuckDB oracle — both engines' regex dialects (java.util.regex /
    * RE2) agree on this conservative subset. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val NumRe = "\\d+"

  /** PII / identifier scrubbing (q53): renders each event as the log
    * line `<type> uid=<id> props=<json>` (all real columns — nothing
    * synthesized) and redacts emails → `<EMAIL>`, IPv4s → `<IP>`, then
    * any remaining digit run → `<NUM>`, counting each pattern at the
    * stage it is applied (so digits inside an already-redacted email/ip
    * are not double-counted).
    *
    * Pure per-row regex kernels — shuffle-free, scan-speed at 100 TB,
    * exactly the shape of a production log-scrubbing pass. Each
    * intermediate string is its own projection: every stage is
    * referenced twice (count + replace), and an inlined alias would
    * re-run the whole upstream regex chain per reference (the
    * measured 10–30× recompute traps documented in Dedup). */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    // concat semantics differ on NULL across engines (Spark concat is
    // null-propagating, DuckDB's skips) — coalesce each piece in both.
    def nz(c: Column): Column = coalesce(c, lit(""))
    Tables.events(s, dir)
      .select(col("event_id"),
        concat(nz(col("event_type")), lit(" uid="),
          nz(col("user_id").cast("string")), lit(" props="),
          nz(col("props"))).as("raw"))
      .select(col("event_id"), col("raw"),
        regexp_count(col("raw"), lit(EmailRe)).cast("long").as("n_email"))
      .select(col("event_id"), col("n_email"),
        regexp_replace(col("raw"), EmailRe, "<EMAIL>").as("r1"))
      .select(col("event_id"), col("n_email"), col("r1"),
        regexp_count(col("r1"), lit(Ipv4Re)).cast("long").as("n_ip"))
      .select(col("event_id"), col("n_email"), col("n_ip"),
        regexp_replace(col("r1"), Ipv4Re, "<IP>").as("r2"))
      .select(col("event_id"), col("n_email"), col("n_ip"), col("r2"),
        regexp_count(col("r2"), lit(NumRe)).cast("long").as("n_num"))
      .select(col("event_id"),
        regexp_replace(col("r2"), NumRe, "<NUM>").as("redacted"),
        col("n_email"), col("n_ip"), col("n_num"))
      .orderBy("event_id")
  }

  // ---- q54: eval-set decontamination ---------------------------------

  /** Docs with doc_id % EvalMod == 0 stand in for the held-out
    * benchmark; everything else is the training corpus. */
  val EvalMod = 20L

  /** Contamination n-gram width — the standard "13-gram" test-set
    * overlap check scaled to the harness's ~30-word documents. */
  val NgramN = 8

  /** Distinct word 8-grams from an already-projected words attribute
    * (the <N guard dodges Spark's descending `sequence`-style count,
    * and keeps the slice length non-negative).
    *
    * Shape matters here: this feeds `explode`, and
    * InferFiltersFromGenerate adds `size(gs) > 0 AND isnotnull(gs)`
    * which PushDownPredicates then substitutes — whole expression —
    * below the words projection. An `element_at(ws, i+k)` formulation
    * (Dedup.shingles3's, safe there because nothing infers filters on
    * the shingle column) re-evaluates the inlined `split` receiver per
    * lambda element in that filter: measured 36 s vs 1 s on this query
    * at sf0.1. `arrays_zip` of N shifted slices references `ws` once
    * per row, so the unavoidable substituted copy costs one extra
    * row-level eval instead of an N·grams regex storm. */
  private def grams8(ws: Column): Column = {
    val nGrams = size(ws) - (NgramN - 1)
    val zipped = arrays_zip(
      (0 until NgramN).map(k => slice(ws, lit(k + 1), nGrams)): _*)
    // coalesce with a non-null literal makes the column provably
    // non-nullable, so the inferred isnotnull(gs) constant-folds and
    // only the (single-eval) size(gs) > 0 copy survives pushdown
    coalesce(
      when(size(ws) >= NgramN,
        array_distinct(transform(zipped,
          st => concat_ws(" ", (0 until NgramN).map(k => st.getField(k.toString)): _*))))
        .otherwise(array().cast("array<string>")),
      array().cast("array<string>"))
  }

  /** Benchmark decontamination (q54): flag every training document
    * sharing at least one word 8-gram with the eval slice, with the
    * shared-gram count and contamination per-mille.
    *
    * Shape for 100 TB: grams are hashed to 60-bit ids so the join
    * moves 8-byte longs, not ~60-byte strings; the eval side — a
    * benchmark suite, MBs even in production — aggregates to a
    * DISTINCT hash set and broadcasts, so the training corpus is
    * scanned once with a map-side semi-join and the only shuffle is
    * the final per-doc count. The oracle joins on the same md5-prefix
    * hashes, so both engines agree even in the (≈ n²/2⁶¹) collision
    * case. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= NgramN)
      .select(col("doc_id"), grams8(col("ws")).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
        explode(col("gs")).as("gram"))
      .select(col("doc_id"), col("n_grams"),
        graft.functions.ArrayFunctions.md5Prefix(col("gram"), 15).as("gh"))
    val evalGrams = grams.filter(col("doc_id") % EvalMod === 0)
      .select("gh").distinct()
    grams.filter(col("doc_id") % EvalMod =!= 0)
      .join(broadcast(evalGrams), "gh")
      .groupBy("doc_id")
      .agg(max("n_grams").as("n_grams"), count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        perMille(col("n_shared"), col("n_grams")).as("contam_milli"))
      .orderBy("doc_id")
  }

  /** Contamination span coverage (q110): q54 counts HOW MANY distinct
    * eval 8-grams a training document shares; this measures HOW MUCH
    * of the document those hits cover — the union of the hit grams'
    * token spans [i, i+7], as distinct covered token positions and an
    * integer-ppm coverage ratio. The distinction drives different
    * remediations: 40 scattered grams (paraphrase-level contamination,
    * drop the doc) versus 40 grams in one 47-token run (a quoted
    * benchmark item — excise the span, keep the doc).
    *
    * Scale shape: identical to q54 up to the broadcast semi-join —
    * positional grams are a per-row array transform, the eval-side
    * hash set broadcasts, so only HIT grams survive into the span
    * explode (hits are rare by construction; the 8× position fan-out
    * applies to hits, not to the corpus). Per-doc span union is one
    * hash aggregation with two distinct counts over those hit rows.
    * The oracle replays the same positional grams in SQL, so the green
    * row pins span arithmetic, not just hit counting. */
  def contamSpans(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= NgramN)
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        posexplode(transform(
          sequence(lit(1), size(col("ws")) - (NgramN - 1)),
          i => graft.functions.ArrayFunctions.md5Prefix(
            concat_ws(" ", slice(col("ws"), i, lit(NgramN))), 15))))
      .select(col("doc_id"), col("n_tokens"),
        (col("pos") + 1).cast("long").as("i"), col("col").as("gh"))
    val evalGrams = base.filter(col("doc_id") % EvalMod === 0)
      .select("gh").distinct()
    base.filter(col("doc_id") % EvalMod =!= 0)
      .join(broadcast(evalGrams), "gh")
      .select(col("doc_id"), col("n_tokens"), col("i"),
        explode(sequence(col("i"), col("i") + (NgramN - 1))).as("p"))
      .groupBy("doc_id")
      .agg(max("n_tokens").as("n_tokens"),
        countDistinct(col("i")).as("n_hit_grams"),
        countDistinct(col("p")).as("covered_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_hit_grams"),
        col("covered_tokens"),
        expr("covered_tokens * 1000000 div n_tokens").as("covered_ppm"))
      .orderBy("doc_id")
  }

  // ---- q55: sequence packing -----------------------------------------

  /** Context-window length (tokens) and shard fan-out for packing. */
  val SeqLen = 512L
  val PackShards = 8L

  /** Greedy sequence packing (q55): concatenate documents in a fixed
    * order and cut the stream into `SeqLen`-token context windows,
    * emitting for every doc the window (`seq_id`) and offset where it
    * starts — the accounting a tokenizer-side packer needs (docs may
    * straddle a boundary; that is standard pack-with-splitting).
    *
    * Packing requires an order, and a single global order means a
    * single-partition sort — so production packs within shards, and so
    * does this: docs hash-shard by `md5(doc_id) % PackShards`, the
    * running token total is a per-shard window cumsum, and shards pack
    * in parallel. At 100 TB the within-shard sort is the whole cost,
    * which is exactly the price of deterministic packing; `PackShards`
    * scales with the cluster. Deterministic: same hash, same order,
    * same windows on every re-run. */
  def sequencePack(s: SparkSession, dir: String): DataFrame = {
    val running = sum("n_tokens").over(
      Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (h8(concat(lit("pack:"), col("doc_id").cast("string"))) % PackShards)
          .as("shard"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(words(col("text")))).cast("long").as("n_tokens"))
      .withColumn("start_tok", (running - col("n_tokens")).cast("long"))
      // start_tok ≤ total shard tokens ≪ 2^53: floor(double-div) is
      // exact, matching DuckDB's integer //
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("start_tok") / lit(SeqLen)).cast("long").as("seq_id"),
        (col("start_tok") % SeqLen).as("seq_offset"))
      .orderBy("doc_id")
  }

  // ---- q122: systematic PPS sampling ---------------------------------

  /** Target sample size per source for q122. */
  val PpsPerSource = 25L

  /** Systematic probability-proportional-to-size sampling (q122): pick
    * ~[[PpsPerSource]] docs per source with inclusion probability
    * proportional to length — the subsample you train scouts on when
    * token (not document) coverage is what matters. The classic
    * A-ES/exponential-key weighted reservoir needs logs and pow —
    * float territory the differential harness bans — so this is the
    * equally standard SYSTEMATIC form, exact in integers: order docs
    * by the cross-engine hash (a deterministic "random" permutation),
    * take the running length total, and select every doc whose
    * cumulative interval [cw−w, cw) crosses a multiple of
    * step = total div target. Longer docs span more multiples —
    * inclusion ∝ length. A doc spanning several multiples is emitted
    * ONCE, so the realized count is ≤ target+1 and shrinks when
    * weights are heavy relative to step (docs with w ≥ step are
    * always selected — the spec's sharp bound).
    *
    * Scale shape: the window cumsum is PARTITIONED by source (same
    * shape as q55's per-shard pack and q97's per-source budget —
    * never a global sort); the per-source totals are a K-row
    * broadcast. Zero-length docs carry zero mass and can never be
    * selected (w > 0 filter keeps step well-defined). */
  def ppsSample(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("w"),
        h8(concat(lit("pps:"), col("doc_id").cast("string"))).as("h"))
      .filter(col("w") > 0)
    val totals = d.groupBy("source")
      .agg(sum("w").as("total_w"))
      .select(col("source"),
        greatest(expr(s"total_w div $PpsPerSource"), lit(1L)).as("step"))
    val cw = sum("w").over(
      Window.partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d.withColumn("cw", cw)
      .join(broadcast(totals), "source")
      .filter(expr("(cw - w) div step") < expr("cw div step"))
      .select(col("source"), col("doc_id"), col("w"), col("cw"),
        expr("cw div step").as("pick_bucket"))
      .orderBy("source", "doc_id")
  }

  // ---- q133: equi-width histogram -------------------------------------

  /** Bin count for q133. */
  val HistBins = 20L

  /** q133: equi-width histogram of the event value in cents —
    * [[featureBins]] (q51) is the equi-DEPTH (quantile) form; this is
    * the fixed-grid companion a profiler draws. Bounds come from one
    * 1-row min/max aggregate broadcast into the binning scan (q66's
    * bounds pattern); bin = (cents−mn)·B div (mx−mn+1) — the +1 makes
    * the top value land in bin B−1 without a special case, and every
    * operand is non-negative so div ≡ //. Emitted with each bin's
    * exact integer bounds and a ppm share.
    *
    * Scale shape: two scans (bounds, then binning — a production
    * profiler fuses these into one pass with an accumulator; two
    * declarative passes keep the oracle exact), one constant-sized
    * census, no window over data. */
  def equiWidthHist(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(Det.cents(col("value")).cast("long").as("cents"))
    val bounds = e.agg(min("cents").as("mn"), max("cents").as("mx"))
    val n1 = e.crossJoin(broadcast(bounds))
      .select(expr(s"(cents - mn) * $HistBins div (mx - mn + 1)").as("bin"),
        col("mn"), col("mx"))
      .groupBy("bin", "mn", "mx")
      .agg(count(lit(1)).as("n"))
    n1.withColumn("n_total", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .select(col("bin"),
        expr(s"mn + bin * (mx - mn + 1) div $HistBins").as("lo_cents"),
        expr(s"mn + (bin + 1) * (mx - mn + 1) div $HistBins - 1").as("hi_cents"),
        col("n"), expr("n * 1000000 div n_total").as("ppm"))
      .orderBy("bin")
  }

  // ---------------------------------------------------------------- q162
  /** Buckets per group for the equi-depth histogram. */
  val DepthBins = 8L

  /** q162: equi-depth histogram — q133's optimizer-grade sibling: per
    * event type, [[DepthBins]] buckets holding (near-)equal ROW counts
    * with their exact value bounds. Equi-width (q133) wastes buckets
    * on empty ranges under skew; equi-depth is what engines actually
    * keep for selectivity estimation (NDV/quantile histograms).
    * Bucket = (rank−1)·B div n over the (cents, event_id) total order
    * — rank-exact, no interpolation, ties split deterministically.
    *
    * Scale shape: the q40/q78 rank-window discipline — one exchange
    * on the GROUP key (histograms are per-column-per-segment objects;
    * a global histogram at 100 TB is the q40 GK sketch instead), then
    * a (group, bucket) hash agg riding the same partitioning. */
  def equiDepthHist(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        Det.cents(col("value")).cast("long").as("cents"))
    val wOrd = Window.partitionBy("event_type").orderBy(col("cents"), col("event_id"))
    val wAll = Window.partitionBy("event_type")
    e.withColumn("rn", row_number().over(wOrd))
      .withColumn("n_rows", count(lit(1)).over(wAll))
      .withColumn("bucket", expr(s"(rn - 1) * $DepthBins div n_rows"))
      .groupBy("event_type", "bucket")
      .agg(min("cents").as("lo_cents"), max("cents").as("hi_cents"),
        count(lit(1)).cast("long").as("n"))
      .orderBy("event_type", "bucket")
  }

  // ---------------------------------------------------------------- q171
  /** q171: cross-source quantile normalization — the mapping table
    * that replaces each source's document-length value with the
    * GLOBAL value at the same relative rank (nearest-rank), the
    * standard distribution-alignment preprocessing step (quantile
    * normalization / CDF matching) before cross-source features are
    * comparable. Emitted per (source, value): the doc count, the
    * within-source percentile, and the normalized global value — the
    * bounded artifact a pipeline joins back onto documents.
    *
    * All integer: within-source rank r is the cumulative census
    * count, the target global rank is k = ⌈r·N/n_s⌉ =
    * (r·N + n_s − 1) div n_s, and the global value at rank k is
    * found WITHOUT any range join: source rows (pos = k) and global
    * census rows (pos = cum) interleave in one ordered frame, and a
    * forward-looking `first(value ignore nulls)` window reads off
    * min{v : gcum ≥ k} — the q21 as-of merge trick on a bounded
    * frame. Ties at pos sort global-after-source, so an exactly-
    * landing rank still matches its own row.
    *
    * Scale shape: two value censuses (per-source and global — one
    * hash agg each), then every window runs over census rows, whose
    * count is bounded by distinct document lengths, not by corpus
    * size (the q115/q163 census argument). The 1-row corpus count
    * broadcasts (declared BNLJ). */
  def quantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("source"), col("n_chars"))
    val srcCensus = d.groupBy("source", "n_chars")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("r", sum("cnt").over(Window.partitionBy("source")
        .orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_s", sum("cnt").over(Window.partitionBy("source")))
    val gCensus = d.groupBy("n_chars").agg(count(lit(1)).as("gcnt"))
      .withColumn("gcum", sum("gcnt").over(Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val tot = d.agg(count(lit(1)).as("n_total"))
    // r·N and r·1e6 widen through DECIMAL(38,0): with a dominant
    // source r·N ≈ N², past int64 from ~3e9 docs (the q170/q182
    // discipline); the quotients land back in long range (pos ≤ N)
    val sRows = srcCensus.crossJoin(broadcast(tot))
      .select(expr("""CAST((CAST(r AS DECIMAL(38,0)) * n_total + n_s - 1)
                     |div n_s AS BIGINT)""".stripMargin).as("pos"),
        lit(0).as("tag"), col("source"), col("n_chars").as("value"),
        col("cnt"),
        expr("CAST(CAST(r AS DECIMAL(38,0)) * 1000000 div n_s AS BIGINT)")
          .as("pct_ppm"),
        lit(null).cast("long").as("gv"))
    val gRows = gCensus.select(col("gcum").as("pos"), lit(1).as("tag"),
      lit(null).cast("string").as("source"), lit(null).cast("long").as("value"),
      lit(null).cast("long").as("cnt"), lit(null).cast("long").as("pct_ppm"),
      col("n_chars").cast("long").as("gv"))
    val w = Window.orderBy(col("pos"), col("tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    sRows.unionAll(gRows)
      .withColumn("norm_value", first(col("gv"), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("source"), col("value").cast("long").as("value"),
        col("cnt").cast("long").as("n_docs"),
        col("pct_ppm").cast("long").as("pct_ppm"),
        col("norm_value").cast("long").as("norm_value"))
      .orderBy("source", "value")
  }

  // ---------------------------------------------------------------- q179
  /** Context-length policy candidates probed by the truncation curve. */
  val LossThresholds: Seq[Long] = Seq(64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)

  /** q179: truncation-loss curve — for each candidate max-sequence
    * length: how many documents get truncated and what fraction of
    * the corpus's tokens is lost. The one-table answer to "what does
    * a 512-token context cost us" that sizes q55's packing and the
    * tokenizer budget before training — computed from the LENGTH
    * CENSUS, so the curve costs one pass however large the corpus.
    *
    * All integer: per-doc token counts collapse to a (n_tok, n_docs)
    * census; each census row explodes onto the constant threshold
    * list (map-side — no join, no BNLJ), and losses aggregate as
    * Σ max(0, n_tok − L)·n_docs. Zero-token docs count in the doc
    * base and can never truncate.
    *
    * Scale shape: doc-count agg + census agg + a |thresholds|-row
    * rollup; the explode multiplies only the BOUNDED census. */
  def truncationCurve(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val counts = d
      .select(col("doc_id"), explode(Det.words(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val census = d.select("doc_id")
      .join(counts, Seq("doc_id"), "left")
      .select(coalesce(col("n_tok"), lit(0L)).as("n_tok"))
      .groupBy("n_tok").agg(count(lit(1)).as("n_docs"))
    census
      .withColumn("max_len",
        explode(array(LossThresholds.map(lit(_)): _*)))
      .groupBy("max_len")
      .agg(
        coalesce(sum(when(col("n_tok") > col("max_len"), col("n_docs"))),
          lit(0L)).as("n_truncated"),
        coalesce(sum(when(col("n_tok") > col("max_len"),
          (col("n_tok") - col("max_len")) * col("n_docs"))), lit(0L))
          .as("tokens_lost"),
        Det.lsum(expr("n_tok * n_docs")).as("tokens_total"),
        Det.lsum(col("n_docs")).as("n_docs_total"))
      .select(col("max_len").cast("long").as("max_len"),
        col("n_truncated").cast("long").as("n_truncated"),
        expr("n_truncated * 1000000 div n_docs_total").as("trunc_ppm"),
        col("tokens_lost").cast("long").as("tokens_lost"),
        expr("tokens_lost * 1000000 div greatest(tokens_total, 1L)")
          .as("loss_ppm"))
      .orderBy("max_len")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_truncation_curve" -> (truncationCurve _),
    "q171_quantile_norm" -> (quantileNormalize _),
    "q162_equidepth_hist" -> (equiDepthHist _),
    "q122_pps_sample" -> (ppsSample _),
    "q133_equiwidth_hist" -> (equiWidthHist _),
    "q47_repetition_stats" -> (repetitionStats _),
    "q48_hash_split" -> (hashSplit _),
    "q49_tfidf_topk" -> (tfIdfTopTerms _),
    "q50_stratified_sample" -> (stratifiedSample _),
    "q51_feature_binning" -> (featureBins _),
    "q53_pii_scrub" -> (piiScrub _),
    "q54_decontaminate" -> (decontaminate _),
    "q55_sequence_pack" -> (sequencePack _),
    "q110_contam_spans" -> (contamSpans _)
  )

  private def h8Sql(e: String): String = Det.h8Sql(e)

  /** The distinct-8-gram contamination CTE chain (`d` → `g` → `th` →
    * `eg` → `contam`), the SQL mirror of [[decontaminate]]'s hit
    * logic. `contam` lists the contaminated training doc_ids; shared
    * between the q54 oracle (which re-aggregates `th ⋈ eg` for its
    * counts) and the q108 curation-funnel oracle. */
  private[ops] lazy val contamCtes: String = {
    val gramCat = (0 until NgramN)
      .map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(" || ' ' || ")
    s"""d AS (
       | SELECT doc_id, w FROM (
       |  SELECT doc_id, string_split_regex(trim(text), '${Det.WsClass}+') AS w
       |  FROM documents)
       | WHERE len(w) >= $NgramN),
       |g AS (
       | SELECT doc_id, list_distinct(list_transform(
       |   generate_series(1, len(w) - ${NgramN - 1}),
       |   i -> $gramCat)) AS gs
       | FROM d),
       |th AS (
       | SELECT doc_id, len(gs) AS n_grams,
       |  CAST(concat('0x', substr(md5(unnest(gs)), 1, 15)) AS BIGINT) AS gh
       | FROM g),
       |eg AS (SELECT DISTINCT gh FROM th WHERE doc_id % $EvalMod = 0),
       |contam AS (
       | SELECT DISTINCT doc_id FROM th JOIN eg USING (gh)
       | WHERE doc_id % $EvalMod != 0)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q179_truncation_curve" ->
      s"""WITH counts AS (
         | SELECT doc_id, count(*) AS n_tok FROM (
         |  SELECT doc_id, unnest(${Det.wordsSql("text")}) AS tok
         |  FROM documents) t
         | WHERE len(tok) > 0 GROUP BY doc_id),
         |census AS (
         | SELECT coalesce(n_tok, 0) AS n_tok, count(*) AS n_docs
         | FROM documents d LEFT JOIN counts USING (doc_id) GROUP BY 1),
         |x AS (
         | SELECT census.*, t.max_len
         | FROM census, UNNEST([${LossThresholds.mkString(", ")}]) AS t(max_len)),
         |g AS (
         | SELECT max_len,
         |  coalesce(sum(CASE WHEN n_tok > max_len THEN n_docs END), 0) AS n_truncated,
         |  coalesce(sum(CASE WHEN n_tok > max_len
         |    THEN (n_tok - max_len) * n_docs END), 0) AS tokens_lost,
         |  CAST(sum(n_tok * n_docs) AS BIGINT) AS tokens_total,
         |  CAST(sum(n_docs) AS BIGINT) AS n_docs_total
         | FROM x GROUP BY max_len)
         |SELECT CAST(max_len AS BIGINT) AS max_len,
         | CAST(n_truncated AS BIGINT) AS n_truncated,
         | ${OracleSql.ppmSql("n_truncated", "n_docs_total")} AS trunc_ppm,
         | CAST(tokens_lost AS BIGINT) AS tokens_lost,
         | ${OracleSql.ppmSql("tokens_lost", "greatest(tokens_total, 1)")} AS loss_ppm
         |FROM g ORDER BY max_len""".stripMargin,
    "q171_quantile_norm" ->
      s"""WITH d AS (SELECT source, n_chars FROM documents),
        |sc AS (SELECT source, n_chars, count(*) AS cnt FROM d GROUP BY 1, 2),
        |sr AS (
        | SELECT source, n_chars, cnt,
        |  sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
        |    ROWS UNBOUNDED PRECEDING) AS r,
        |  sum(cnt) OVER (PARTITION BY source) AS n_s
        | FROM sc),
        |gc AS (SELECT n_chars, count(*) AS gcnt FROM d GROUP BY 1),
        |gr AS (
        | SELECT n_chars,
        |  sum(gcnt) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS gcum
        | FROM gc),
        |tot AS (SELECT count(*) AS n_total FROM d),
        |u AS (
        | SELECT (r * n_total + n_s - 1) // n_s AS pos, 0 AS tag, source,
        |   n_chars AS value, cnt, ${OracleSql.ppmSql("r", "n_s")} AS pct_ppm,
        |   CAST(NULL AS BIGINT) AS gv
        | FROM sr CROSS JOIN tot
        | UNION ALL
        | SELECT gcum, 1, NULL, NULL, NULL, NULL, n_chars FROM gr),
        |m AS (
        | SELECT *, first_value(gv IGNORE NULLS) OVER (ORDER BY pos, tag
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS norm_value
        | FROM u)
        |SELECT source, CAST(value AS BIGINT) AS value,
        | CAST(cnt AS BIGINT) AS n_docs,
        | CAST(pct_ppm AS BIGINT) AS pct_ppm,
        | CAST(norm_value AS BIGINT) AS norm_value
        |FROM m WHERE tag = 0 ORDER BY source, value""".stripMargin,
    "q162_equidepth_hist" ->
      s"""WITH c AS (
         | SELECT event_type, event_id,
         |  CAST(round(value * 100) AS BIGINT) AS cents
         | FROM events),
         |r AS (
         | SELECT event_type, cents,
         |  row_number() OVER (PARTITION BY event_type
         |    ORDER BY cents, event_id) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS n_rows
         | FROM c),
         |b AS (
         | SELECT event_type, (rn - 1) * $DepthBins // n_rows AS bucket, cents
         | FROM r)
         |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
         | CAST(min(cents) AS BIGINT) AS lo_cents,
         | CAST(max(cents) AS BIGINT) AS hi_cents,
         | CAST(count(*) AS BIGINT) AS n
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_repetition_stats" ->
      s"""WITH d AS (
        | SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '${Det.WsClass}+') AS w FROM documents),
        |base AS (
        | SELECT doc_id,
        |  CASE WHEN length(list_aggregate(w, 'string_agg', '')) = 0 THEN 0
        |       ELSE len(w) END AS n_tokens,
        |  len(list_distinct(w)) AS n_distinct,
        |  greatest(len(w) - 1, 0) AS n_bigrams
        | FROM d),
        |tok AS (
        | SELECT doc_id, unnest(w) AS tok,
        |        generate_subscripts(w, 1) AS i
        | FROM d),
        |toptok AS (
        | SELECT doc_id, max(c) AS top_token_count FROM (
        |  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
        | GROUP BY doc_id),
        |bg AS (
        | SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
        | FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        |topbg AS (
        | SELECT doc_id, max(c) AS top_bigram_count FROM (
        |  SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2)
        | GROUP BY doc_id)
        |SELECT base.doc_id, n_tokens, n_distinct, n_bigrams,
        | coalesce(top_token_count, 0) AS top_token_count,
        | coalesce(top_bigram_count, 0) AS top_bigram_count,
        | CASE WHEN n_tokens = 0 THEN 0
        |      ELSE (n_tokens - n_distinct) * 1000 // n_tokens END AS dup_token_milli,
        | CASE WHEN n_bigrams = 0 THEN 0
        |      ELSE coalesce(top_bigram_count, 0) * 1000 // n_bigrams END AS top_bigram_milli,
        | CAST(dup_token_milli <= $MaxDupTokenMilli AND
        |   (n_bigrams < $MinBigramsForFilter OR top_bigram_milli <= $MaxTopBigramMilli) AS BIGINT) AS keep
        |FROM base
        |LEFT JOIN toptok ON base.doc_id = toptok.doc_id
        |LEFT JOIN topbg ON base.doc_id = topbg.doc_id
        |ORDER BY base.doc_id""".stripMargin,
    "q48_hash_split" ->
      s"""SELECT doc_id,
         | ${h8Sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
         | CASE WHEN bucket < $TrainPct THEN 'train'
         |      WHEN bucket < $ValPct THEN 'val'
         |      ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q49_tfidf_topk" ->
      s"""WITH tok AS (
         | SELECT doc_id, unnest(string_split_regex(trim(text), '${Det.WsClass}+')) AS term
         | FROM documents),
         |tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         | SELECT doc_id, term, tf, df, tf * ((n_docs * 1000) // df) AS score
         | FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (
         | SELECT *, CAST(row_number() OVER (
         |   PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS rnk
         | FROM scored)
         |SELECT doc_id, term, tf, df, score, rnk
         |FROM r WHERE rnk <= $TfIdfTopK ORDER BY doc_id, rnk""".stripMargin,
    "q50_stratified_sample" ->
      s"""SELECT doc_id, lang,
         | ${h8Sql("concat('strat:', CAST(doc_id AS VARCHAR))")} % 1000 AS bucket
         |FROM documents
         |WHERE bucket < (CASE lang ${
          StratRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
        } ELSE 0 END)
         |ORDER BY doc_id""".stripMargin,
    "q51_feature_binning" ->
      s"""SELECT event_id, event_type,
         | ntile($NBins) OVER (
         |   PARTITION BY event_type ORDER BY value, event_id) AS bin,
         | CAST(round(value * 100) AS BIGINT) AS value_cents
         |FROM events ORDER BY event_id""".stripMargin,
    "q53_pii_scrub" ->
      s"""WITH raw AS (
         | SELECT event_id,
         |  coalesce(event_type, '') || ' uid=' ||
         |  coalesce(CAST(user_id AS VARCHAR), '') || ' props=' ||
         |  coalesce(props, '') AS raw
         | FROM events),
         |s1 AS (
         | SELECT event_id,
         |  len(regexp_extract_all(raw, '$EmailRe')) AS n_email,
         |  regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g') AS r1
         | FROM raw),
         |s2 AS (
         | SELECT event_id, n_email,
         |  len(regexp_extract_all(r1, '$Ipv4Re')) AS n_ip,
         |  regexp_replace(r1, '$Ipv4Re', '<IP>', 'g') AS r2
         | FROM s1)
         |SELECT event_id,
         | regexp_replace(r2, '$NumRe', '<NUM>', 'g') AS redacted,
         | n_email, n_ip,
         | len(regexp_extract_all(r2, '$NumRe')) AS n_num
         |FROM s2 ORDER BY event_id""".stripMargin,
    "q54_decontaminate" ->
      s"""WITH $contamCtes
         |SELECT doc_id, any_value(n_grams) AS n_grams, count(*) AS n_shared,
         | (count(*) * 1000) // any_value(n_grams) AS contam_milli
         |FROM th JOIN eg USING (gh)
         |WHERE doc_id % $EvalMod != 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q110_contam_spans" -> {
      val gramCat = (0 until NgramN)
        .map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH d AS (
         | SELECT doc_id, w FROM (
         |  SELECT doc_id, string_split_regex(trim(text), '${Det.WsClass}+') AS w
         |  FROM documents)
         | WHERE len(w) >= $NgramN),
         |pos AS (
         | SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, w,
         |  unnest(generate_series(1, len(w) - ${NgramN - 1})) AS i
         | FROM d),
         |th AS (
         | SELECT doc_id, n_tokens, i,
         |  CAST(concat('0x', substr(md5($gramCat), 1, 15)) AS BIGINT) AS gh
         | FROM pos),
         |eg AS (SELECT DISTINCT gh FROM th WHERE doc_id % $EvalMod = 0),
         |hits AS (
         | SELECT doc_id, n_tokens, i FROM th JOIN eg USING (gh)
         | WHERE doc_id % $EvalMod != 0),
         |cov AS (
         | SELECT doc_id, n_tokens, i,
         |  unnest(generate_series(i, i + ${NgramN - 1})) AS p
         | FROM hits)
         |SELECT doc_id, any_value(n_tokens) AS n_tokens,
         | count(DISTINCT i) AS n_hit_grams,
         | count(DISTINCT p) AS covered_tokens,
         | ${OracleSql.ppmSql("count(DISTINCT p)", "any_value(n_tokens)")} AS covered_ppm
         |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q55_sequence_pack" ->
      s"""WITH t AS (
         | SELECT doc_id,
         |  ${h8Sql("concat('pack:', CAST(doc_id AS VARCHAR))")} % $PackShards AS shard,
         |  CASE WHEN length(trim(text)) = 0 THEN 0
         |       ELSE len(string_split_regex(trim(text), '${Det.WsClass}+')) END AS n_tokens
         | FROM documents),
         |r AS (
         | SELECT doc_id, shard, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    - n_tokens AS start_tok
         | FROM t)
         |SELECT doc_id, shard, n_tokens,
         | start_tok // $SeqLen AS seq_id,
         | start_tok % $SeqLen AS seq_offset
         |FROM r ORDER BY doc_id""".stripMargin,
    "q122_pps_sample" ->
      s"""WITH d AS (
         | SELECT doc_id, source, n_chars AS w,
         |  ${h8Sql("concat('pps:', CAST(doc_id AS VARCHAR))")} AS h
         | FROM documents WHERE n_chars > 0),
         |t AS (SELECT source,
         |  greatest(sum(w) // $PpsPerSource, 1) AS step
         | FROM d GROUP BY source),
         |c AS (SELECT doc_id, source, w,
         |  CAST(sum(w) OVER (PARTITION BY source ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
         | FROM d)
         |SELECT source, doc_id, CAST(w AS BIGINT) AS w, cw,
         | CAST(cw // step AS BIGINT) AS pick_bucket
         |FROM c JOIN t USING (source)
         |WHERE (cw - w) // step < cw // step
         |ORDER BY source, doc_id""".stripMargin,
    "q133_equiwidth_hist" ->
      s"""WITH e AS (
         | SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM e),
         |h AS (
         | SELECT (cents - mn) * $HistBins // (mx - mn + 1) AS bin, mn, mx,
         |  count(*) AS n
         | FROM e, b GROUP BY 1, 2, 3)
         |SELECT CAST(bin AS BIGINT) AS bin,
         | CAST(mn + bin * (mx - mn + 1) // $HistBins AS BIGINT) AS lo_cents,
         | CAST(mn + (bin + 1) * (mx - mn + 1) // $HistBins - 1 AS BIGINT) AS hi_cents,
         | n, ${OracleSql.ppmSql("n", "(SELECT sum(n) FROM h)")} AS ppm
         |FROM h ORDER BY bin""".stripMargin
  )
}
