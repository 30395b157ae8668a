package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CountMinAgg
import graft.Tables
import graft.functions.ArrayFunctions

/** Heavy hitters over the lineitem part stream (q71): the hot-key
  * monitor every large-scale pipeline runs — hot tokens, hot URLs, hot
  * join keys (the same skew [[LshSkew]] guards against downstream).
  *
  * Two sides, verified against each other row-for-row:
  *   - a count-min sketch ([[CountMinAgg]], depth 4 × width 512) built
  *     in ONE mergeable pass — constant 16 KiB of state per partial
  *     regardless of input size, the structure a 100 TB stream actually
  *     affords (and the streaming-aggregation form of the same
  *     operator: the merge IS the state update);
  *   - the exact per-key frequency table, which at harness scale DuckDB
  *     recomputes — including the sketch grid itself, rebuilt in SQL
  *     from the exact counts (counter sums commute, so aggregating
  *     counts into buckets equals streaming raw rows into them). The
  *     estimate column is therefore hash-checked EXACTLY, not merely
  *     bound-flagged — stronger verification than q39/q40, possible
  *     because count-min (unlike HLL/GK) is deterministic given its
  *     hash family.
  *
  * A key is a heavy hitter when its exact count ≥ 1.4× the mean key
  * frequency (`cnt · 5 · n_keys ≥ 7 · n` in integers — SF-independent).
  * `within_bound` pins the classic CM guarantee exact ≤ est ≤ exact +
  * (e/width)·N, here with 3/512 ≈ e/512 rounded up to stay integral.
  *
  * Plan shape: one pass for the sketch (1-row frame), one
  * groupBy(key) for the exact side, both broadcast-joined onto the
  * heavy keys — no shuffle wider than the exact count's key exchange.
  */
object HeavyHitters {

  val CmDepth = 4
  val CmWidth = 512

  /** h_j(key) as a Column — same constants as [[CountMinAgg.bucket]]. */
  private def bucketCol(j: Int, key: Column): Column =
    ((lit(CountMinAgg.A(j)) * (key % lit(CountMinAgg.P)) +
      lit(CountMinAgg.B(j)))
      % lit(CountMinAgg.P)) % lit(CmWidth.toLong)

  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHittersOf(Tables.lineitem(s, dir).select(col("l_partkey").as("key")))

  /** Core derivation over any single-column `key` frame (nullable ok). */
  private[graft] def heavyHittersOf(keys: DataFrame): DataFrame = {
    val sketch = keys.agg(
      ArrayFunctions.countMinSketch(col("key"), CmDepth, CmWidth).as("cm"))
    val exact = keys.groupBy("key").agg(count(lit(1)).as("exact_cnt"))
    // derived from the exact side's shuffle output — a third full scan
    // of the fact table plus a countDistinct shuffle said the same
    // count(col) not count(*): the exact groupBy would give a NULL-key
    // group its own row, but the oracle's count(DISTINCT key) excludes
    // NULLs — count over the key column keeps the derivation
    // oracle-equivalent for any (nullable) key input.
    val tot = exact.agg(sum("exact_cnt").cast("long").as("n"),
      count(col("key")).as("n_keys"))
    val estimate = least((0 until CmDepth).map(j =>
      element_at(col("cm"), (lit(j.toLong * CmWidth) + bucketCol(j, col("key")) + lit(1L)).cast("int"))): _*)
    exact
      .crossJoin(broadcast(tot))
      .filter(col("exact_cnt") * lit(5L) * col("n_keys") >= lit(7L) * col("n"))
      .crossJoin(broadcast(sketch))
      .withColumn("cm_estimate", estimate)
      .select(
        col("key").as("part_id"),
        col("exact_cnt"),
        col("cm_estimate"),
        expr(s"cast(cm_estimate >= exact_cnt and " +
          s"cm_estimate <= exact_cnt + (3 * n) div $CmWidth as bigint)")
          .as("within_bound"))
      .orderBy("part_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_heavy_hitters" -> (heavyHitters _)
  )

  /** The oracle rebuilds the identical grid from exact counts: bucket
    * sums of counts ≡ streaming increments (addition commutes). */
  val oracles: Map[String, String] = Map(
    "q71_heavy_hitters" -> {
      val hashRows = (0 until CmDepth)
        .map(j => s"($j, ${CountMinAgg.A(j)}, ${CountMinAgg.B(j)})")
        .mkString(", ")
      s"""WITH k AS (SELECT l_partkey AS key FROM lineitem),
         |exact AS (SELECT key, count(*) AS exact_cnt FROM k GROUP BY 1),
         |tot AS (SELECT count(*) AS n, count(DISTINCT key) AS n_keys FROM k),
         |hs AS (
         | SELECT key, exact_cnt, j,
         |  ((a * (key % ${CountMinAgg.P}) + b) % ${CountMinAgg.P}) % $CmWidth AS bkt
         | FROM exact CROSS JOIN (VALUES $hashRows) AS h(j, a, b)),
         |bsum AS (
         | SELECT j, bkt, CAST(sum(exact_cnt) AS BIGINT) AS bc
         | FROM hs GROUP BY 1, 2),
         |est AS (
         | SELECT key, min(bc) AS cm_estimate
         | FROM hs JOIN bsum USING (j, bkt) GROUP BY key)
         |SELECT key AS part_id, exact_cnt, cm_estimate,
         | CAST(cm_estimate >= exact_cnt AND
         |   cm_estimate <= exact_cnt + (3 * n) // $CmWidth AS BIGINT)
         |   AS within_bound
         |FROM exact JOIN est USING (key) CROSS JOIN tot
         |WHERE exact_cnt * 5 * n_keys >= 7 * n
         |ORDER BY part_id""".stripMargin
    }
  )
}
