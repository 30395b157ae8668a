package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.FlightStates
import graft.ops.Det._

/** Correctness-harness queries that exercise the reference's TRANSFORM
  * KERNEL (T1–T4, P1/P2/P4 — `load_warehouse.py:62-91`) over the 14
  * captured reference extracts (the states CSVs in /root/reference/data,
  * copied as test resources — they are data fixtures, not code). DuckDB
  * oracles mirror the pandas coercions in SQL, so every coercion rule
  * (null-on-garbage doubles, strict 2-value boolean map, epoch→
  * timestamp, nullable-int double hop) is hash-verified cell-for-cell,
  * not just unit-tested.
  *
  * Determinism notes: `load_timestamp` (wall clock) is excluded from
  * output; timestamps are emitted as epoch MICROS BIGINT so no
  * engine-timezone representation is in the hash; (file_source, icao24)
  * is verified unique across the fixtures → total ORDER BY key.
  */
object FlightQueries {

  /** Fixture location; absolute so the driver's cwd doesn't matter. */
  val FixturesDir: String = sys.env.getOrElse(
    "GRAFT_FIXTURES_DIR", "/root/repo/src/test/resources/opensky")

  /** The full cleaned 17-column state-vector layout (deterministic
    * subset: audit load_timestamp excluded, file name kept). */
  def q23FlightClean(s: SparkSession, dir: String): DataFrame = {
    val clean = FlightStates.transform(
      FlightStates.withAudit(FlightStates.readRaw(s, FixturesDir)))
    clean.select(
        col("file_source"), col("icao24"), col("callsign"),
        col("origin_country"),
        unix_micros(col("time_position")).as("time_position_us"),
        unix_micros(col("last_contact")).as("last_contact_us"),
        col("longitude"), col("latitude"), col("baro_altitude"),
        col("on_ground"), col("velocity"), col("true_track"),
        col("vertical_rate"), col("sensors"), col("geo_altitude"),
        col("squawk"), col("spi"), col("position_source"))
      .orderBy(col("file_source"), col("icao24"))
  }

  /** The M0 "slice" analytics query over cleaned states: airborne
    * traffic per origin country (count + fixed-point velocity sum, so
    * the mean is derivable without hashing an order-dependent double
    * aggregate). */
  def q24FlightAirborne(s: SparkSession, dir: String): DataFrame = {
    val clean = FlightStates.transform(
      FlightStates.withAudit(FlightStates.readRaw(s, FixturesDir)))
    clean.filter(col("on_ground") === false)
      .groupBy(col("origin_country"))
      .agg(count(lit(1)).as("n_airborne"),
        count(col("velocity")).as("n_velocity"),
        lsum(cents(col("velocity"))).as("velocity_cents_sum"),
        lsum(cents(col("baro_altitude"))).as("baro_cents_sum"))
      .orderBy(col("origin_country"))
  }

  private def fixtureCte: String =
    s"""WITH raw AS (
       |  SELECT *, regexp_extract(filename, '[^/]+$$', 0) AS file_source
       |  FROM read_csv('$FixturesDir/states_*.csv',
       |                header=true, all_varchar=true, filename=true)
       |), clean AS (
       |  SELECT file_source, icao24, callsign, origin_country,
       |   CAST(round(TRY_CAST(time_position AS DOUBLE)*1000000) AS BIGINT) AS time_position_us,
       |   CAST(round(TRY_CAST(last_contact AS DOUBLE)*1000000) AS BIGINT) AS last_contact_us,
       |   TRY_CAST(longitude AS DOUBLE) AS longitude,
       |   TRY_CAST(latitude AS DOUBLE) AS latitude,
       |   TRY_CAST(baro_altitude AS DOUBLE) AS baro_altitude,
       |   CASE WHEN lower(on_ground)='true' THEN true
       |        WHEN lower(on_ground)='false' THEN false END AS on_ground,
       |   TRY_CAST(velocity AS DOUBLE) AS velocity,
       |   TRY_CAST(true_track AS DOUBLE) AS true_track,
       |   TRY_CAST(vertical_rate AS DOUBLE) AS vertical_rate,
       |   sensors,
       |   TRY_CAST(geo_altitude AS DOUBLE) AS geo_altitude,
       |   squawk,
       |   CASE WHEN lower(spi)='true' THEN true
       |        WHEN lower(spi)='false' THEN false END AS spi,
       |   CASE WHEN isnan(TRY_CAST(position_source AS DOUBLE))
       |          OR isinf(TRY_CAST(position_source AS DOUBLE)) THEN NULL
       |        ELSE CAST(trunc(TRY_CAST(position_source AS DOUBLE)) AS INTEGER)
       |   END AS position_source
       |  FROM raw
       |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_flight_clean" -> (q23FlightClean _),
    "q24_flight_airborne" -> (q24FlightAirborne _)
  )

  val oracles: Map[String, String] = Map(
    "q23_flight_clean" ->
      s"""$fixtureCte
         |SELECT * FROM clean ORDER BY file_source, icao24""".stripMargin,
    "q24_flight_airborne" ->
      s"""$fixtureCte
         |SELECT origin_country, count(*) AS n_airborne,
         | count(velocity) AS n_velocity,
         | CAST(sum(round(velocity*100)) AS BIGINT) AS velocity_cents_sum,
         | CAST(sum(round(baro_altitude*100)) AS BIGINT) AS baro_cents_sum
         |FROM clean WHERE on_ground = false
         |GROUP BY origin_country ORDER BY origin_country""".stripMargin
  )
}
