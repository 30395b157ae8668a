package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** K2 JDBC append against embedded Derby (ships with Spark) — proves
  * the distributed JDBC sink path end to end. The Postgres-specific
  * control stores (ON CONFLICT / RETURNING) remain driver-side JDBC by
  * design and are exercised against their JSONL twins. */
class JdbcSinksSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = new java.util.Properties()

  test("K2 appendTable lands a cleaned frame in a JDBC table and appends") {
    val clean = FlightStates.cleanFromDir(spark, fixturesDir)
      .select("icao24", "origin_country", "longitude", "latitude", "on_ground")
    val n = clean.count()

    JdbcSinks.appendTable(clean, url, "raw_flight_states", props, numPartitions = 2)
    val readBack = spark.read.jdbc(url, "raw_flight_states", props)
    assert(readBack.count() === n)
    // spot-check typed content round-trip (JDBC frames are lazy —
    // evaluate BEFORE the second append re-doubles the table)
    val got = readBack.filter(col("on_ground") === true).count()
    val want = clean.filter(col("on_ground") === true).count()
    assert(got === want)
    // append semantics: a second write doubles, never truncates
    JdbcSinks.appendTable(clean, url, "raw_flight_states", props, numPartitions = 2)
    assert(spark.read.jdbc(url, "raw_flight_states", props).count() === 2 * n)
  }

  test("stage 6 JDBC mart load is idempotent per event_date") {
    val wh = tmpDir("wh-jdbc")
    val agg = tmpDir("agg-jdbc")
    WarehouseBuild.load(FlightStates.cleanFromDir(spark, fixturesDir), wh)
    val n = WarehouseBuild.aggregate(spark, wh, agg, "2025-11-01", "2025-12-31")
    assert(n > 0)

    val loaded = WarehouseBuild.loadMartJdbc(spark, agg, url, "mart_daily", props,
      numPartitions = 2)
    assert(loaded === n)
    val mart = spark.read.jdbc(url, "mart_daily", props)
    assert(mart.count() === n)

    // re-running the SAME range converges instead of duplicating
    val reloaded = WarehouseBuild.loadMartJdbc(spark, agg, url, "mart_daily", props,
      numPartitions = 2)
    assert(reloaded === n)
    val after = spark.read.jdbc(url, "mart_daily", props)
    assert(after.count() === n, "per-date delete-then-append is idempotent")
    // content equals the parquet aggregate cell-for-cell
    val aggDf = spark.read.parquet(agg)
      .select("event_date", "origin_country", "n_aircraft", "n_states")
    val martDf = after
      .select("event_date", "origin_country", "n_aircraft", "n_states")
    assert(aggDf.exceptAll(martDf).isEmpty && martDf.exceptAll(aggDf).isEmpty)
  }
}
