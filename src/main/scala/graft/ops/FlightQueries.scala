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

  // ---------- q64/q65: geospatial over the positioned states ----------

  /** Geo units: positions as exact micro-degrees (round(deg·1e6) —
    * BIGINT, engine-identical); q64 density cells are half-degree;
    * q65's closeness threshold is 0.25° with 2·eps shifted-grid cells. */
  val MicroDeg = 1000000L
  val DensityCellMicro = 500000L
  val CloseEpsMicro = 250000L

  private def positioned(s: SparkSession): DataFrame =
    FlightStates.transform(
      FlightStates.withAudit(FlightStates.readRaw(s, FixturesDir)))
      .filter(col("latitude").isNotNull && col("longitude").isNotNull)
      .select(col("file_source"), col("icao24"), col("on_ground"),
        round(col("latitude") * MicroDeg).cast("long").as("ulat"),
        round(col("longitude") * MicroDeg).cast("long").as("ulon"))

  /** Traffic density per half-degree grid cell (q64): states, distinct
    * aircraft, airborne count. Cell ids via floor-of-double-division —
    * IEEE-identical across engines on identical inputs (DuckDB's `//`
    * would truncate negatives). One hash agg, shuffle on the cell. */
  def q64GeoDensity(s: SparkSession, dir: String): DataFrame =
    positioned(s)
      .select(col("file_source"), col("icao24"), col("on_ground"),
        floor(col("ulat") / lit(DensityCellMicro.toDouble)).cast("long").as("cell_lat"),
        floor(col("ulon") / lit(DensityCellMicro.toDouble)).cast("long").as("cell_lon"))
      .groupBy("cell_lat", "cell_lon")
      .agg(count(lit(1)).as("n_states"),
        countDistinct("icao24").as("n_aircraft"),
        sum((!col("on_ground")).cast("long")).as("n_airborne"))
      .orderBy("cell_lat", "cell_lon")

  /** Co-located aircraft pairs per snapshot file (q65): both
    * coordinates within `CloseEpsMicro` (squared micro-degree
    * distance ≤ eps²), found by the same candidates-then-verify
    * pattern as the LSH dedups — never all-pairs. Candidate cells are
    * the classic 4 shifted grids: with cell width 2·eps and per-axis
    * shifts {0, eps}, two points within eps per axis share a cell in
    * at least one of the four (a pair can straddle one grid's
    * boundary, not both shifts'), so the GRID construction is
    * recall-exact — up to the hot-cell cap: like every LSH-family
    * generator, cells over `spark.graft.lsh.maxBucket` are dropped
    * with a loud counter (weaker recall beats a quadratic cell), so
    * at-scale recall is exact only for cells within the cap. Verify
    * is exact 64-bit integer arithmetic. */
  def q65GeoClosePairs(s: SparkSession, dir: String): DataFrame = {
    val w = 2 * CloseEpsMicro
    val p = positioned(s)
    // a hot cell (airport holding stacks at 100 TB) is the same hazard
    // as a hot LSH bucket; the same cap + surfaced metric guards it
    val cells = LshSkew.capBuckets(
      p.select(col("file_source"), col("icao24"),
        explode(array((for (gx <- 0 to 1; gy <- 0 to 1) yield
          struct(lit(gx * 2 + gy).as("g"),
            floor((col("ulat") + lit(gx * CloseEpsMicro)) / lit(w.toDouble))
              .cast("long").as("cx"),
            floor((col("ulon") + lit(gy * CloseEpsMicro)) / lit(w.toDouble))
              .cast("long").as("cy"))): _*)).as("c"))
        .select(col("file_source"), col("icao24"), col("c.g").as("g"),
          col("c.cx").as("cx"), col("c.cy").as("cy")),
      Seq("file_source", "g", "cx", "cy"), "geo")
    val cand = cells.as("x")
      .join(cells.as("y"), Seq("file_source", "g", "cx", "cy"))
      .where(col("x.icao24") < col("y.icao24"))
      .select(col("file_source"), col("x.icao24").as("icao_a"),
        col("y.icao24").as("icao_b"))
      .distinct()
    val a = p.select(col("file_source"), col("icao24").as("icao_a"),
      col("ulat").as("lat_a"), col("ulon").as("lon_a"))
    val b = p.select(col("file_source"), col("icao24").as("icao_b"),
      col("ulat").as("lat_b"), col("ulon").as("lon_b"))
    cand.join(a, Seq("file_source", "icao_a")).join(b, Seq("file_source", "icao_b"))
      .select(col("file_source"), col("icao_a"), col("icao_b"),
        ((col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b")) +
          (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b"))).as("d2"))
      .filter(col("d2") <= CloseEpsMicro * CloseEpsMicro)
      .orderBy("file_source", "icao_a", "icao_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_flight_clean" -> (q23FlightClean _),
    "q24_flight_airborne" -> (q24FlightAirborne _),
    "q64_geo_density" -> (q64GeoDensity _),
    "q65_geo_close_pairs" -> (q65GeoClosePairs _)
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
         |GROUP BY origin_country ORDER BY origin_country""".stripMargin,
    "q64_geo_density" ->
      s"""$fixtureCte, $posCte
         |SELECT CAST(floor(ulat / $DensityCellMicro.0) AS BIGINT) AS cell_lat,
         | CAST(floor(ulon / $DensityCellMicro.0) AS BIGINT) AS cell_lon,
         | count(*) AS n_states,
         | count(DISTINCT icao24) AS n_aircraft,
         | CAST(sum(CAST(NOT on_ground AS BIGINT)) AS BIGINT) AS n_airborne
         |FROM pos GROUP BY cell_lat, cell_lon
         |ORDER BY cell_lat, cell_lon""".stripMargin,
    "q65_geo_close_pairs" ->
      s"""$fixtureCte, $posCte,
         |cells AS (
         | SELECT file_source, icao24, gx*2 + gy AS gk,
         |  CAST(floor((ulat + gx*$CloseEpsMicro) / ${2 * CloseEpsMicro}.0) AS BIGINT) AS cx,
         |  CAST(floor((ulon + gy*$CloseEpsMicro) / ${2 * CloseEpsMicro}.0) AS BIGINT) AS cy
         | FROM pos
         | CROSS JOIN (SELECT unnest([0, 1]) AS gx)
         | CROSS JOIN (SELECT unnest([0, 1]) AS gy)),
         |cand AS (
         | SELECT DISTINCT x.file_source, x.icao24 AS icao_a, y.icao24 AS icao_b
         | FROM cells x JOIN cells y
         |  ON x.file_source = y.file_source AND x.gk = y.gk
         |  AND x.cx = y.cx AND x.cy = y.cy AND x.icao24 < y.icao24)
         |SELECT file_source, icao_a, icao_b, d2 FROM (
         | SELECT c.file_source, icao_a, icao_b,
         |  (a.ulat - b.ulat)*(a.ulat - b.ulat) +
         |  (a.ulon - b.ulon)*(a.ulon - b.ulon) AS d2
         | FROM cand c
         | JOIN pos a ON a.file_source = c.file_source AND a.icao24 = c.icao_a
         | JOIN pos b ON b.file_source = c.file_source AND b.icao24 = c.icao_b)
         |WHERE d2 <= ${CloseEpsMicro * CloseEpsMicro}
         |ORDER BY file_source, icao_a, icao_b""".stripMargin
  )

  private def posCte: String =
    s"""pos AS (
       | SELECT file_source, icao24, on_ground,
       |  CAST(round(latitude * $MicroDeg) AS BIGINT) AS ulat,
       |  CAST(round(longitude * $MicroDeg) AS BIGINT) AS ulon
       | FROM clean
       | WHERE latitude IS NOT NULL AND longitude IS NOT NULL)""".stripMargin
}
