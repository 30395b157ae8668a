package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Full-text retrieval primitives over `documents` (q69/q70): the
  * inverted-index build and BM25 ranking that sit next to tf-idf
  * (q49) in any corpus pipeline — search-index construction IS a
  * large-scale batch job (the posting build below is the exact shape
  * of a distributed indexer's first stage).
  *
  * Scale shape: everything is explode → hash-aggregate with map-side
  * combine; corpus-level scalars (N, total tokens) ride a broadcast
  * 1-row frame (the q49 pattern), never a driver-side collect. BM25's
  * per-(doc, term) scoring is a projection over the tf frame joined
  * with a broadcast df frame — shuffles only on doc/term keys.
  */
object Search {


  /** Whitespace tokens, empties dropped — splitting an empty string
    * yields [""] in BOTH engines, and a leading separator yields a ""
    * first token, so the `!= ''` filter keeps the two tokenizers
    * identical. */
  private[ops] def tokens(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(Det.words(col("text"))).as("term"))
    .filter(col("term") =!= "")

  // ---- q69: inverted-index posting statistics -------------------------

  /** Posting-list build + stats (q69). The real artifact of an indexer
    * is (term → sorted doc list); the harness compare cannot hash an
    * array column, so the list itself is emitted as content-complete
    * scalars: df (list length), cf (total term frequency), min/max
    * doc, and two order-independent checksums (sum, xor) that pin the
    * exact membership of every posting list — any missing or extra
    * doc_id changes at least one of them.
    *
    * Two hash aggregations: (term, doc) for tf, then term; both with
    * partial aggregation. At 100 TB this is the canonical index-build
    * plan — shuffle keyed on term, skew bounded by the vocabulary's
    * Zipf head (a hot term's postings still aggregate, never join).
    *
    * Bound: `doc_sum` is an UNFOLDED Int64 sum, exact while
    * Σ doc_id ≤ 2^63 — for a term present in nearly every document
    * that holds to ~4e9 docs (Σ ≈ D²/2); past that the checksums move
    * to modular sums (a [[Det.h8]]-folded variant), the same
    * escalation the bm25 doc pins for its corpus aggregates. */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    tokens(Tables.documents(s, dir))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(
        count(lit(1)).as("df"),
        sum("tf").cast("long").as("cf"),
        min("doc_id").as("doc_min"),
        max("doc_id").as("doc_max"),
        sum("doc_id").cast("long").as("doc_sum"),
        expr("bit_xor(doc_id)").as("doc_xor"))
      .orderBy("term")

  // ---- q70: BM25 ranking ----------------------------------------------

  /** The fixed retrieval query. */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "hash", "window")
  val Bm25TopK = 100

  /** Integer BM25 (q70): k1 = 6/5, b = 3/4, and q49's integer idf
    * (idf_pm = N·1000 div df) instead of a log — the engines must
    * agree bit-for-bit, and a float log differs in the last ulp
    * between libm implementations (production swaps the idf for
    * ln((N−df+0.5)/(df+0.5)+1) — a one-line change; the plan is
    * identical). The classic per-term score
    *
    *   idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * is evaluated with every intermediate BOUNDED: first avgdl =
    * T div N (≥ 1, every dl row has ≥ 1 token), then the milli-scale
    * denominator den_m = 1000·tf + 300 + (900·dl) div avgdl, then the
    * tf-saturation factor sat_m = 2200000·tf div den_m — which lives
    * in [0, 2200] because den_m ≥ 1000·tf — and only THEN the idf
    * product, term_score = idf_pm · sat_m (micro units). Per-doc sum
    * over |Bm25Terms| ≤ 4 terms tops out at 4·2200·1000·N, inside
    * Int64 for N up to ~10¹² docs — a corpus bound documented here
    * because non-ANSI Spark wraps silently where DuckDB raises; the
    * earlier single-rational form (idf·22·tf·T div …) overflowed at
    * ~10⁸ docs via the tf·T product.
    *
    * Integer sums are order-independent; global top-k by
    * (score, doc_id). Shape: tf and dl are the indexer aggregations;
    * df is a vocabulary-sized frame (broadcast); N/T a 1-row
    * broadcast; the final top-k is TakeOrderedAndProject — no global
    * sort.
    *
    * The corpus scalars avgdl and idf_pm are folded into the broadcast
    * df frame (a |vocab|-row crossJoin with the 1-row corpus frame, on
    * the BUILD side) so the per-(doc,term) row does exactly two
    * divisions and the probe side has one broadcast hash join. The
    * BNLJ has MOVED, not vanished: the vocab×1-row build crossJoin
    * still plans as a (vocabulary-sized) BroadcastNestedLoopJoin —
    * which is why q70 stays in PlanInvariantsSpec.bnlAllowed. */
  def bm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = tokens(docs)
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = tok.filter(col("term").isin(Bm25Terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("t_tokens"))
    val dfAug = df.crossJoin(corpus).select(
      col("term"),
      expr("n_docs * 1000 div df").as("idf_pm"),
      expr("t_tokens div n_docs").as("avgdl"))
    tf.join(broadcast(dfAug), "term")
      .join(dl, "doc_id")
      .withColumn("den_m", expr("1000 * tf + 300 + (900 * dl) div avgdl"))
      .withColumn("sat_m", expr("2200000 * tf div den_m"))
      .withColumn("term_score", expr("idf_pm * sat_m"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_terms"),
        sum("term_score").cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(Bm25TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_inverted_index" -> (invertedIndex _),
    "q70_bm25" -> (bm25 _)
  )

  private val tokCte =
    s"""tok AS (
       | SELECT doc_id, unnest(${Det.wordsSql("text")}) AS term
       | FROM documents),
       |tk AS (SELECT doc_id, term FROM tok WHERE term <> '')""".stripMargin

  val oracles: Map[String, String] = Map(
    "q69_inverted_index" ->
      s"""WITH $tokCte,
         |tf AS (SELECT term, doc_id, count(*) AS tf FROM tk GROUP BY 1, 2)
         |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
         | min(doc_id) AS doc_min, max(doc_id) AS doc_max,
         | CAST(sum(doc_id) AS BIGINT) AS doc_sum,
         | bit_xor(doc_id) AS doc_xor
         |FROM tf GROUP BY term ORDER BY term""".stripMargin,
    "q70_bm25" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH $tokCte,
         |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
         |       WHERE term IN ($termList) GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS t_tokens
         |           FROM dl),
         |scored AS (
         | SELECT doc_id,
         |  ((n_docs * 1000) // df) *
         |    (2200000 * tf // (1000 * tf + 300 + (900 * dl) // (t_tokens // n_docs)))
         |    AS term_score
         | FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus)
         |SELECT doc_id, count(*) AS n_terms,
         | CAST(sum(term_score) AS BIGINT) AS score_micro
         |FROM scored GROUP BY doc_id
         |ORDER BY score_micro DESC, doc_id LIMIT $Bm25TopK""".stripMargin
    }
  )
}
