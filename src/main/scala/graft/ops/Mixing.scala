package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic dataset mixing (q73): the everyday pretraining op the
  * prep family (q47–q55) still lacked — combine multi-source corpora
  * at declared epoch weights, where a weight of 2.5 means "2.5 passes
  * over this source per training epoch" (up-sampling) and 0.3 means a
  * 30 % sub-sample (down-sampling).
  *
  * Semantics, all integer / hash-deterministic so the DuckDB oracle
  * hash-matches every cell:
  *   - each source has a per-mille epoch weight w (2500 = 2.5 epochs);
  *   - a document is emitted `w div 1000` times, plus once more iff
  *     md5('mix:' ++ doc_id) % 1000 < w mod 1000 — so EXPECTED copies
  *     equal the weight exactly, membership of the fractional copy is
  *     content-stable (re-runs, retries and cluster resizes reproduce
  *     the same mixture bit-for-bit, where a `rand()` mixture poisons
  *     eval decontamination downstream);
  *   - each emitted copy gets an interleave key `ord_bucket` =
  *     md5('ord:' ++ doc_id ++ ':' ++ copy_idx) % 1024: hash-ordering
  *     by it shuffles the copies of all sources together (a writer
  *     repartitions on it), so consecutive training batches see the
  *     declared mixture instead of runs of one source — and the two
  *     copies of an up-sampled doc land in different shards.
  *
  * Shape at 100 TB: pure per-row projection + explode of an
  * `array_repeat` whose length is the integer copy count (≤ ⌈max
  * weight⌉, a constant) — no shuffle at all until the writer's
  * repartition(ord_bucket), no RNG state, no driver participation.
  */
object Mixing {

  /** Per-mille epoch weight by source. The synthetic corpus ships 20
    * sources; the 5-step cycle gives the mixture a realistic spread
    * (heavy up-sample ... hard down-sample) while keeping the table
    * explicit. Unknown sources default to 0 — dropped, loudly visible
    * in the output's source column set. */
  val MixWeights: Seq[(String, Long)] =
    (0 until 20).map(i => s"src$i" -> Seq(300L, 700L, 1000L, 1800L, 2500L)(i % 5))

  val OrdBuckets = 1024L

  private def h8(c: Column): Column = Det.h8(c)

  def mixture(s: SparkSession, dir: String): DataFrame = {
    val weight = MixWeights.foldLeft(lit(0L)) { case (acc, (src, w)) =>
      when(col("source") === src, lit(w)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), weight.as("weight_milli"))
      .withColumn("n_copies",
        (col("weight_milli") / lit(1000L)).cast("long") +
          when(h8(concat(lit("mix:"), col("doc_id").cast("string"))) % 1000
            < col("weight_milli") % 1000, 1L).otherwise(0L))
      .select(col("doc_id"), col("source"), col("weight_milli"),
        posexplode(array_repeat(lit(1), col("n_copies").cast("int"))))
      .withColumn("copy_idx", (col("pos") + 1).cast("long"))
      .select(col("doc_id"), col("copy_idx"), col("source"),
        col("weight_milli"),
        (h8(concat(lit("ord:"), col("doc_id").cast("string"), lit(":"),
          col("copy_idx").cast("string"))) % OrdBuckets).as("ord_bucket"))
      .orderBy("doc_id", "copy_idx")
  }

  // ---------------------------------------------------------------- q105

  /** Hashed-feature space for the importance model: tokens hash into
    * this many buckets, so both distributions are fixed-size vectors
    * regardless of vocabulary (the DSIR trick — Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * NeurIPS 2023 — with hashed unigrams standing in for hashed
    * bigrams). */
  val DsirBuckets = 1024L

  /** The target distribution is the high-quality slice the mixture
    * (q73) up-samples: every source with epoch weight ≥ 1800 per
    * mille. Deriving it from [[MixWeights]] keeps ONE declaration of
    * "which sources do we trust" across both operators. */
  def dsirTargetSources: Seq[String] = MixWeights.filter(_._2 >= 1800L).map(_._1)

  /** DSIR-style importance scores (q105): score every document by how
    * much more its hashed-unigram profile resembles the target
    * distribution (the trusted sources) than the raw corpus — the
    * data-selection signal used to pick pretraining documents that
    * "look like" a curated reference. The log-likelihood-ratio weight
    * log p_t(b)/p_r(b) is replaced by the integer ppm difference
    * p_t(b)−p_r(b) so both engines agree bit-for-bit (same ranking
    * direction, no transcendentals); a document's score is the SUM of
    * its tokens' bucket deltas, and `keep` selects strictly positive
    * scores. No division by token count: `keep` is scale-free under
    * the sum (selection compares to 0), and signed integer division
    * is the one operator the two engines floor differently.
    *
    * Scale shape: explode → groupBy(bucket) builds both distributions
    * in one map-side-combining pass (1024-row result); the per-token
    * scoring join broadcasts that 1024-row delta table; per-doc sums
    * hash-aggregate on (doc_id, source). The token stream is scanned
    * twice (once to fit, once to score) — the standard two-pass shape
    * of any fitted transform, each pass embarrassingly parallel. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(Det.words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("source"),
        (h8(col("w")) % DsirBuckets).as("b"))
    val bcnt = tok.groupBy("b").agg(
      count(lit(1)).as("c_all"),
      sum(col("source").isin(dsirTargetSources: _*).cast("long")).as("c_tgt"))
    // agg without groupBy: exactly one row even on a degenerate corpus
    val totals = bcnt.agg(sum("c_all").as("t_all"), sum("c_tgt").as("t_tgt"))
    val delta = bcnt.crossJoin(broadcast(totals))
      .select(col("b"),
        (expr("c_tgt * 1000000 div t_tgt") -
          expr("c_all * 1000000 div t_all")).as("delta_ppm"))
    val scored = tok.join(broadcast(delta), Seq("b"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"), sum("delta_ppm").as("score_sum"))
    // left join keeps zero-token documents in the census (score 0)
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id", "source"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("score_sum"), lit(0L)).as("score_ppm_sum"),
        (coalesce(col("score_sum"), lit(0L)) > 0).cast("long").as("keep"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_dataset_mix" -> (mixture _),
    "q105_dsir_weights" -> (dsirWeights _)
  )

  private def h8Sql(e: String): String = Det.h8Sql(e)

  val oracles: Map[String, String] = Map(
    "q73_dataset_mix" -> {
      val cases = MixWeights
        .map { case (src, w) => s"WHEN '$src' THEN $w" }.mkString(" ")
      s"""WITH w AS (
         | SELECT doc_id, source,
         |  CAST(CASE source $cases ELSE 0 END AS BIGINT) AS weight_milli
         | FROM documents),
         |c AS (
         | SELECT doc_id, source, weight_milli,
         |  weight_milli // 1000 +
         |  CASE WHEN ${h8Sql("concat('mix:', CAST(doc_id AS VARCHAR))")} % 1000
         |       < weight_milli % 1000 THEN 1 ELSE 0 END AS n_copies
         | FROM w),
         |e AS (
         | SELECT doc_id, source, weight_milli,
         |  unnest(generate_series(1, n_copies)) AS copy_idx
         | FROM c WHERE n_copies > 0)
         |SELECT doc_id, CAST(copy_idx AS BIGINT) AS copy_idx, source,
         | weight_milli,
         | ${h8Sql("concat('ord:', CAST(doc_id AS VARCHAR), ':', CAST(copy_idx AS VARCHAR))")}
         |   % $OrdBuckets AS ord_bucket
         |FROM e ORDER BY doc_id, copy_idx""".stripMargin
    },
    "q105_dsir_weights" -> {
      val tgtList = dsirTargetSources.map(s => s"'$s'").mkString(", ")
      s"""WITH tok AS (
         | SELECT doc_id, source, unnest(${Det.wordsSql("text")}) AS w
         | FROM documents),
         |tk AS (
         | SELECT doc_id, source, ${h8Sql("w")} % $DsirBuckets AS b
         | FROM tok WHERE w <> ''),
         |bcnt AS (
         | SELECT b, count(*) AS c_all,
         |  CAST(sum(CASE WHEN source IN ($tgtList) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS c_tgt
         | FROM tk GROUP BY 1),
         |tot AS (
         | SELECT CAST(sum(c_all) AS BIGINT) AS t_all,
         |        CAST(sum(c_tgt) AS BIGINT) AS t_tgt FROM bcnt),
         |delta AS (
         | SELECT b, ${OracleSql.ppmSql("c_tgt", "t_tgt")} - ${OracleSql.ppmSql("c_all", "t_all")}
         |   AS delta_ppm
         | FROM bcnt CROSS JOIN tot),
         |sc AS (
         | SELECT doc_id, source, count(*) AS n_tok,
         |  CAST(sum(delta_ppm) AS BIGINT) AS ss
         | FROM tk JOIN delta USING (b) GROUP BY 1, 2)
         |SELECT d.doc_id, d.source,
         | coalesce(n_tok, 0) AS n_tok,
         | coalesce(ss, 0) AS score_ppm_sum,
         | CAST(coalesce(ss, 0) > 0 AS BIGINT) AS keep
         |FROM documents d
         |LEFT JOIN sc ON d.doc_id = sc.doc_id AND d.source = sc.source
         |ORDER BY d.doc_id""".stripMargin
    }
  )
}
