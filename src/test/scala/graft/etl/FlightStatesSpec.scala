package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden + property coverage of the T1–T4/P1–P4 coercion kernel
  * (reference `load_warehouse.py:62-91` pandas semantics). */
class FlightStatesSpec extends SparkTestBase {

  import spark.implicits._

  private def coerced(colName: String, values: Seq[String]) = {
    val df = values.toDF(colName)
    val out = FlightStates.transform(
      df.withColumn("load_timestamp", lit(null).cast("timestamp"))
        .withColumn("file_source", lit("t.csv")))
    out.select(colName).collect().map(_.get(0)).toSeq
  }

  // ---- T4: strict 2-value lowercase boolean map ----

  test("T4 strictBool accepts only true/false, case-insensitively") {
    assert(coerced("on_ground", Seq("true", "True", "TRUE", "false", "FaLsE"))
      === Seq(true, true, true, false, false))
  }

  test("T4 strictBool rejects Spark-native boolean spellings") {
    // Spark's CAST(x AS BOOLEAN) accepts 1/0/t/f/y/n/yes/no — the
    // reference's map does NOT; all must be NULL.
    assert(coerced("spi",
      Seq("1", "0", "t", "f", "y", "n", "yes", "no", "nan", "", " true"))
      === Seq.fill(11)(null))
  }

  // ---- T2: nullable-int double hop ----

  test("T2 position_source: '0.9' truncates to 0 via the double hop") {
    assert(coerced("position_source", Seq("0.9", "1", "2.999", "-3.7"))
      === Seq(0, 1, 2, -3))
  }

  test("T2 position_source: NaN/Inf/garbage are NULL, not 0") {
    assert(coerced("position_source",
      Seq("NaN", "Infinity", "-Infinity", "abc", ""))
      === Seq.fill(5)(null))
  }

  // ---- T1: string→double, null-on-garbage ----

  test("T1 doubles parse scientific notation and null on garbage") {
    assert(coerced("longitude", Seq("1e3", "-4.25", "abc", ""))
      === Seq(1000.0, -4.25, null, null))
  }

  // ---- T3: epoch seconds via double (fractional epochs survive) ----

  test("T3 fractional epoch '1.5' becomes 1.5 s, not NULL") {
    val ts = coerced("time_position", Seq("1700000000", "1.5", "junk"))
    assert(ts(0) === java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000000L)))
    assert(ts(1) === java.sql.Timestamp.from(
      java.time.Instant.ofEpochMilli(1500L)))
    assert(ts(2) === null)
  }

  // ---- P1/P2: projection order and null back-fill ----

  test("P1/P2 transform back-fills missing columns and pins the 19-col order") {
    val df = Seq(("ab123", "true")).toDF("icao24", "on_ground")
      .withColumn("load_timestamp", lit(null).cast("timestamp"))
      .withColumn("file_source", lit("f.csv"))
    val out = FlightStates.transform(df)
    assert(out.columns.toSeq === FlightStates.FinalColumns)
    val r = out.head()
    assert(r.getAs[String]("icao24") === "ab123")
    assert(r.getAs[Boolean]("on_ground") === true)
    // every back-filled column is NULL
    FlightStates.FinalColumns
      .filterNot(Set("icao24", "on_ground", "file_source").contains)
      .foreach(c => assert(r.getAs[Any](c) == null, s"expected NULL $c"))
  }

  // ---- table-driven property sweep vs a scala-side reference impl ----

  test("T2 property sweep: nullableInt == truncate-toward-zero of parseable doubles") {
    val samples = (-1000 to 1000 by 7).map(_.toString) ++
      Seq("2.5", "-2.5", "1e2", "0.0", "-0.0", "9e9", "-9e9", "NaN",
        "Infinity", "-Infinity", "x", "", "12abc", " 7 ", "0x10")
    val expected = samples.map { s =>
      // reference semantics: to_numeric coerce → truncate, <NA> for
      // NaN/±Inf; int32 overflow nulls (documented narrowing); Spark's
      // trimmed-string double cast accepts " 7 ".
      scala.util.Try(s.trim.toDouble).toOption match {
        case Some(d) if d.isNaN || d.isInfinite => null
        case Some(d) if d > Int.MaxValue || d < Int.MinValue => null
        case Some(d) => Int.box(d.toInt)
        case None => null
      }
    }
    assert(coerced("position_source", samples) === expected)
  }

  // ---- golden totals over the 14 captured reference extracts ----

  test("golden: 14 fixture files, 1834 rows, pinned null profile") {
    val clean = FlightStates.cleanFromDir(spark, fixturesDir)
    assert(clean.count() === 1834L)
    val nulls = clean.select(
      count(lit(1)).as("n"),
      count(when(col("callsign").isNull ||
        trim(col("callsign")) === "", 1)).as("blank_callsign"),
      count(when(col("baro_altitude").isNull, 1)).as("null_baro"),
      count(when(col("on_ground").isNull, 1)).as("null_onground"),
      countDistinct(col("file_source")).as("files")).head()
    assert(nulls.getAs[Long]("files") === 14L)
    // strict-bool map: every fixture on_ground value is True/False → 0 nulls
    assert(nulls.getAs[Long]("null_onground") === 0L)
    // pinned from the reference data: on-ground rows leave altitude empty
    assert(nulls.getAs[Long]("null_baro") > 0L)
  }

  test("golden: fixture booleans use pandas True/False capitalization") {
    val raw = FlightStates.readRaw(spark, fixturesDir)
    val vals = raw.select(collect_set("on_ground")).head().getSeq[String](0)
    assert(vals.toSet.subsetOf(Set("True", "False")))
    // and the strict map still parses them (lowercase comparison)
    val clean = FlightStates.transform(FlightStates.withAudit(raw))
    assert(clean.filter(col("on_ground").isNull).count() === 0L)
  }

  test("readRaw round-trips the writer's RFC-4180 doubled-quote escape") {
    // ExtractJob.csvField (Python csv.writer dialect) escapes a quote
    // by doubling; Spark's DEFAULT quote-escape is backslash, under
    // which the cell reads back with both quote chars kept. readRaw
    // pins escape='"' so a quoted cell is byte-identical after the
    // round trip — the same cell the DSv2 source path delivers.
    val d = tmpDir("csv-dialect")
    val tricky = "he said \"hi\", twice"
    val quoted = "\"" + tricky.replace("\"", "\"\"") + "\""
    assert(quoted === "\"he said \"\"hi\"\", twice\"")
    val header = FlightStates.RawColumns.mkString(",")
    val row = Seq("abc123", quoted) ++ Seq.fill(FlightStates.RawColumns.size - 2)("")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "states_dialect_test.csv"),
      (header + "\r\n" + row.mkString(",") + "\r\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val raw = FlightStates.readRaw(spark, d)
    assert(raw.count() === 1L)
    assert(raw.select("callsign").head().getString(0) === tricky)
  }
}
