package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Behavioral tests for the SCD Type-2 history build (q76) on a
  * constructed event stream with a known run structure, plus the
  * structural invariants any Type-2 table must satisfy on real data. */
class ScdSpec extends SparkTestBase {

  import spark.implicits._

  /** user 1: a→a→b→a (3 runs, with a revisit); user 2: single run of
    * c; user 3: alternation b→c→b→c (4 runs). Timestamps are micros
    * so the parquet round-trip is exact. */
  private lazy val dir: String = {
    val d = tmpDir("scd")
    val rows = Seq(
      (1L, 10L, "a", 1000000L), (1L, 11L, "a", 2000000L),
      (1L, 12L, "b", 3000000L), (1L, 13L, "a", 4000000L),
      (2L, 20L, "c", 1000000L),
      (3L, 30L, "b", 1000000L), (3L, 31L, "c", 2000000L),
      (3L, 32L, "b", 3000000L), (3L, 33L, "c", 4000000L))
    rows.toDF("user_id", "event_id", "event_type", "us")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q76 collapses runs with correct versions and validity intervals") {
    val got = Scd.scd2History(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5))).toSeq
    val expected = Seq(
      (1L, 1L, "a", 1000000L, 3000000L, 2L),
      (1L, 2L, "b", 3000000L, 4000000L, 1L),
      (1L, 3L, "a", 4000000L, -1L, 1L),
      (2L, 1L, "c", 1000000L, -1L, 1L),
      (3L, 1L, "b", 1000000L, 2000000L, 1L),
      (3L, 2L, "c", 2000000L, 3000000L, 1L),
      (3L, 3L, "b", 3000000L, 4000000L, 1L),
      (3L, 4L, "c", 4000000L, -1L, 1L))
    assert(got === expected)
  }

  test("q76 invariants on the real event stream") {
    val sf = "/root/testdata/sf0.001"
    val h = Scd.scd2History(spark, sf).cache()
    try {
      val n = h.count()
      assert(n > 0)
      // exactly one open (current) row per user
      val users = h.select("user_id").distinct().count()
      assert(h.where(col("valid_to_us").isNull).count() === users)
      // versions are 1..k contiguous per user
      val badVersions = h.groupBy("user_id")
        .agg(count(lit(1)).as("k"), max("version").as("mx"),
          min("version").as("mn"))
        .where(col("mx") =!= col("k") || col("mn") =!= 1L).count()
      assert(badVersions === 0L)
      // intervals chain: valid_to of version v = valid_from of v+1,
      // and no adjacent runs share an event_type (else not a change)
      val chain = h.alias("x").join(h.alias("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.version") + 1 === col("y.version"))
      assert(chain.where(col("x.valid_to_us") =!=
        col("y.valid_from_us")).count() === 0L)
      assert(chain.where(col("x.event_type") ===
        col("y.event_type")).count() === 0L)
      // run lengths add back up to the event count
      val total = graft.Tables.events(spark, sf).count()
      val summed = h.agg(sum("n_events")).head().getLong(0)
      assert(summed === total)
    } finally h.unpersist()
  }
}
