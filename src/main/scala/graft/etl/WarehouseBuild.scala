package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagram stage 4 — "Load to warehouse" — which the reference declares
  * but never implemented (SURVEY.md scoping note). Spark-first form:
  * the cleaned state table lands as parquet PARTITIONED BY event date,
  * so every date-bounded warehouse query prunes to the touched
  * partitions at file-listing time (`PartitionFilters` in the scan,
  * verified by test) instead of scanning 100 TB of history.
  *
  * Partition key choice: `event_date` (from `time_position`) rather
  * than load date — analytics filter on when flights HAPPENED;
  * `load_timestamp` stays as an audit column. Rows with NULL event
  * time land in the `__HIVE_DEFAULT_PARTITION__` bucket and stay
  * queryable. Partition count grows by 1/day — safe for any horizon.
  */
object WarehouseBuild {

  /** Append a cleaned batch into the partitioned warehouse layout. */
  def load(clean: DataFrame, warehouseDir: String): Unit =
    clean
      .withColumn("event_date", to_date(col("time_position")))
      .write.mode("append")
      .partitionBy("event_date")
      .parquet(warehouseDir)

  def table(spark: SparkSession, warehouseDir: String): DataFrame =
    spark.read.parquet(warehouseDir)

  /** Example date-bounded mart query: daily airborne aircraft counts
    * per origin country over a date range — the scan must show the
    * range as PartitionFilters, not data filters. */
  def dailyAirborne(spark: SparkSession, warehouseDir: String,
      from: String, to: String): DataFrame =
    table(spark, warehouseDir)
      .filter(col("event_date") >= lit(from) && col("event_date") <= lit(to)
        && col("on_ground") === false)
      .groupBy("event_date", "origin_country")
      .agg(countDistinct("icao24").as("n_aircraft"),
        count(lit(1)).as("n_states"))
      .orderBy("event_date", "origin_country")
}
