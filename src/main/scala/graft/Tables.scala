package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
  /** `events.ts` arrives in whichever parquet flavor the harness's
    * generator used that round, so normalize all three to TimestampType:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong` so it scans as
    *    LongType nanos, truncated to micros with integer DIV (a double
    *    round-trip would lose precision — ns epochs ≈ 1.7e18 > 2^53).
    *    Matches DuckDB's ns→us truncation in the oracle.
    *  - TIMESTAMP_MICROS with isAdjustedToUTC=false: Spark 4 infers
    *    TIMESTAMP_NTZ; cast to TimestampType — sessions run in UTC, so
    *    the wallclock (and every derived unix_micros) is unchanged and
    *    agrees with DuckDB's naive read of the same file.
    *  - TIMESTAMP_MICROS adjusted to UTC: already TimestampType. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
