package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the harness's TPC-H-ish star schema (TESTDATA.md).
  *
  * Plain parquet scans: callers `select`/`filter` immediately after, so
  * Catalyst prunes columns (`ReadSchema`) and pushes predicates
  * (`PushedFilters`) into the vectorized parquet reader. At 100 TB the
  * same code path applies — scans stay narrow and splittable; nothing
  * here collects to the driver.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * so it scans as LongType nanos; we normalize to TimestampType by
    * truncating to micros with integer DIV (a double round-trip would
    * lose precision — ns epochs ≈ 1.7e18 > 2^53). Matches DuckDB's
    * ns→us truncation in the oracle. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
