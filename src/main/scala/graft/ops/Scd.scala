package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Slowly-changing-dimension operators over the `events` stream — the
  * warehouse-build step the reference pipeline's mart stage leads to
  * (load_warehouse.py models a single-version dimension; Type 2 is
  * the standard history-preserving upgrade every warehouse needs).
  *
  * q76 builds a Type-2 history: each user's event_type sequence is
  * collapsed into versioned runs (gaps-and-islands), with
  * `valid_from_us` / `valid_to_us` validity intervals in epoch micros
  * (NULL `valid_to_us` = current row) and the run's event count.
  *
  * Scale design: one shuffle on user_id serves BOTH window passes
  * (the run-change flag and the cumulative version number share the
  * same partitioning and sort), the groupBy(user_id, version) reuses
  * that exchange, and the valid_to lookup is a lead() over the same
  * user partitioning — the whole history build is ONE exchange wide,
  * the natural key it would be bucketed on in a 100 TB warehouse.
  * Ordering is total (ts, event_id unique tiebreak), so versions are
  * deterministic; micros via `unix_micros` ≡ DuckDB `epoch_us` (both
  * truncate the parquet nanos — see [[graft.Tables.events]]).
  */
object Scd {

  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    val runs = e
      .withColumn("prev_et", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev_et").isNull ||
          col("prev_et") =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(w))
    val wv = Window.partitionBy("user_id").orderBy("version")
    runs.groupBy("user_id", "version", "event_type")
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("valid_from_us"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wv))
      .select("user_id", "version", "event_type",
        "valid_from_us", "valid_to_us", "n_events")
      .orderBy("user_id", "version")
  }

  // ---------------------------------------------------------------- q131
  /** q131: latest-wins compaction — materialize each user's CURRENT
    * row from the event stream, the Type-1 counterpart of q76's
    * Type-2 history and the compaction every CDC ingest runs to turn
    * an append log into an upsert table (Hudi/Delta `merge` semantics
    * as a query). "Latest" is the same total order as q76 —
    * (event time, event_id) — so the pick is deterministic under
    * equal timestamps.
    *
    * Scale shape: one rank window on the natural key (the partition a
    * 100 TB upsert table is bucketed by); nothing else. */
  def latestCompaction(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("event_id").desc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        Det.cents(col("value")).cast("long").as("value_cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "us", "value_cents")
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_scd2_history" -> (scd2History _),
    "q131_latest_compaction" -> (latestCompaction _)
  )

  val oracles: Map[String, String] = Map(
    "q76_scd2_history" ->
      """WITH base AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |  lag(event_type) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS prev_et
        | FROM events),
        |runs AS (
        | SELECT user_id, event_type, us,
        |  CAST(sum(CASE WHEN prev_et IS NULL OR prev_et <> event_type
        |           THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    AS BIGINT) AS version
        | FROM base),
        |hist AS (
        | SELECT user_id, version, event_type, count(*) AS n_events,
        |  min(us) AS valid_from_us
        | FROM runs GROUP BY 1, 2, 3)
        |SELECT user_id, version, event_type, valid_from_us,
        | lead(valid_from_us) OVER
        |   (PARTITION BY user_id ORDER BY version) AS valid_to_us,
        | n_events
        |FROM hist ORDER BY user_id, version""".stripMargin,
    "q131_latest_compaction" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS value_cents
        | FROM events),
        |r AS (
        | SELECT user_id, event_id, event_type, us, value_cents,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY us DESC, event_id DESC) AS rn
        | FROM e)
        |SELECT user_id, event_id, event_type, us, value_cents
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
