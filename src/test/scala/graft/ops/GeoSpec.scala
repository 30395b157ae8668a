package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Geo queries vs a brute-force differential over the real fixtures:
  * the shifted-grid candidate scheme must be recall-EXACT (every
  * brute-force close pair surfaces) and precise (every emitted pair
  * verifies). Density cells must partition the points. */
class GeoSpec extends SparkTestBase {

  test("q65 equals the all-pairs reference on the fixture snapshots") {
    val eps2 = FlightQueries.CloseEpsMicro * FlightQueries.CloseEpsMicro
    val got = FlightQueries.q65GeoClosePairs(spark, fixturesDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    // brute force (test-only): all same-file pairs, exact integer d2
    val clean = graft.etl.FlightStates.transform(
      graft.etl.FlightStates.withAudit(
        graft.etl.FlightStates.readRaw(spark, fixturesDir)))
      .filter(col("latitude").isNotNull && col("longitude").isNotNull)
      .select(col("file_source"), col("icao24"),
        round(col("latitude") * FlightQueries.MicroDeg).cast("long").as("ulat"),
        round(col("longitude") * FlightQueries.MicroDeg).cast("long").as("ulon"))
    val pts = clean.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = (for {
      a <- pts; b <- pts
      if a._1 == b._1 && a._2 < b._2
      d2 = (a._3 - b._3) * (a._3 - b._3) + (a._4 - b._4) * (a._4 - b._4)
      if d2 <= eps2
    } yield (a._1, a._2, b._2) -> d2).toMap
    assert(got === want, "shifted-grid candidates must be recall-exact")
    assert(got.nonEmpty, "the fixtures contain at least one close pair")
  }

  test("q64 cells partition the positioned points") {
    val rows = FlightQueries.q64GeoDensity(spark, fixturesDir).collect()
    val totalStates = rows.map(_.getAs[Long]("n_states")).sum
    val positioned = graft.etl.FlightStates.transform(
      graft.etl.FlightStates.withAudit(
        graft.etl.FlightStates.readRaw(spark, fixturesDir)))
      .filter(col("latitude").isNotNull && col("longitude").isNotNull).count()
    assert(totalStates === positioned, "every positioned state lands in one cell")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_aircraft") <= r.getAs[Long]("n_states"))
      assert(r.getAs[Long]("n_airborne") <= r.getAs[Long]("n_states"))
    }
  }
}
