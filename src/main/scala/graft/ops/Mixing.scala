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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_dataset_mix" -> (mixture _)
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
    }
  )
}
