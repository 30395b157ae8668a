package graft.streaming

import graft.SparkTestBase
import graft.etl.FlightStates
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The transformWithState sessionization (ListState + event-time
  * timers) must emit exactly what the flatMapGroupsWithState form
  * emits — on the real-fixture stream ⊆ batch invariant AND on the
  * adversarial out-of-order bridging scenario. RocksDB provider is
  * required by the API; setting it session-wide also re-runs the
  * fMGWS side under it, which must not change ITS output either. */
class FlightSessionsTwsSpec extends SparkTestBase {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDB[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def drainTo(name: String,
      op: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[FlightSessions.FlightSession],
      dir: String, schema: org.apache.spark.sql.types.StructType,
      perFile: Boolean): Unit = {
    val reader = spark.readStream.schema(schema)
    val stream = (if (perFile) reader.option("maxFilesPerTrigger", "1")
                  else reader).parquet(s"$dir/*.parquet")
    val q = op(stream).toDF().writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir(s"tws-sess-ckpt-$name"))
      .format("memory").queryName(name).outputMode("append")
      .start()
    q.awaitTermination()
  }

  test("tws sessions ≡ fMGWS sessions on the real fixture stream") {
    withRocksDB {
      val d = tmpDir("tws-sess-clean")
      FlightStates.cleanFromDir(spark, fixturesDir)
        .write.mode("overwrite").parquet(d)
      val schema = spark.read.parquet(d).schema
      drainTo("tws_sess_real", FlightSessionsTws.sessionsStream(_),
        d, schema, perFile = false)
      drainTo("fmgws_sess_real", FlightSessions.sessionsStream(_),
        d, schema, perFile = false)
      val key = Seq("icao24", "session_start", "session_end", "n_states")
      val tws = spark.table("tws_sess_real")
      val fmgws = spark.table("fmgws_sess_real")
      assert(tws.count() == fmgws.count() &&
        tws.join(fmgws, key, "left_anti").count() == 0 &&
        fmgws.join(tws, key, "left_anti").count() == 0,
        "the two APIs must emit the same session set on real data")
    }
  }

  test("tws handles out-of-order extend/separate/bridge identically") {
    withRocksDB {
      import spark.implicits._
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val batches = Seq(
        Seq(("a", ts("2026-01-01 10:00:00"))),
        Seq(("a", ts("2026-01-01 09:55:00")), ("a", ts("2026-01-01 09:10:00"))),
        Seq(("a", ts("2026-01-01 10:50:00"))),
        Seq(("a", ts("2026-01-01 10:25:00"))),
        Seq(("z", ts("2026-01-01 13:00:00"))))
      val d = tmpDir("tws-sess-ooo")
      batches.zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("icao24", "time_position")
          .coalesce(1).write.parquet(s"$d/b$i.parquet")
        java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"b$i.parquet"))
          .filter(p => p.toString.endsWith(".parquet") &&
            !java.nio.file.Files.isDirectory(p))
          .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(
              1000000000000L + i * 60000L)))
      }
      val schema = spark.read.parquet(s"$d/b0.parquet").schema
      drainTo("tws_sess_ooo", FlightSessionsTws.sessionsStream(_),
        d, schema, perFile = true)
      val got = spark.table("tws_sess_ooo")
        .filter(col("icao24") === "a")
        .collect().map(r => (r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      val want = FlightSessions.sessionsBatch(
        batches.flatten.filter(_._1 == "a").toDF("icao24", "time_position"))
        .collect().map(r => (r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(got == want,
        s"bridged/extended sessions must match the batch mirror; " +
          s"got $got want $want")
    }
  }

  test("a watermark-only batch seals via the registered timer") {
    withRocksDB {
      import spark.implicits._
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // b0 opens a's session; b1 carries ONLY another key far in the
      // future — a's seal can come only from handleExpiredTimer (no
      // input rows for key a in that batch)
      val batches = Seq(
        Seq(("a", ts("2026-01-01 10:00:00"))),
        Seq(("z", ts("2026-01-01 15:00:00"))),
        Seq(("z", ts("2026-01-01 18:00:00"))))
      val d = tmpDir("tws-sess-timer")
      batches.zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("icao24", "time_position")
          .coalesce(1).write.parquet(s"$d/b$i.parquet")
        java.nio.file.Files.walk(java.nio.file.Paths.get(d, s"b$i.parquet"))
          .filter(p => p.toString.endsWith(".parquet") &&
            !java.nio.file.Files.isDirectory(p))
          .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(
              1000000000000L + i * 60000L)))
      }
      val schema = spark.read.parquet(s"$d/b0.parquet").schema
      drainTo("tws_sess_timer", FlightSessionsTws.sessionsStream(_),
        d, schema, perFile = true)
      val got = spark.table("tws_sess_timer")
        .filter(col("icao24") === "a")
        .collect().map(r => (r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert(got == Set(("2026-01-01 10:00:00.0", 1L)),
        s"the timer must seal a's session without any input row; got $got")
    }
  }
}
