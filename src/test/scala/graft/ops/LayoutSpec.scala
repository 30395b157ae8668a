package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** End-to-end partitioned-layout test: write the events stream
  * Hive-partitioned by day, prove the day-filtered read prunes at
  * partition-listing time (PartitionFilters non-empty, scanned file
  * count = one partition's), and check result parity. */
class LayoutSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("date-partitioned write prunes day-filtered scans") {
    val out = tmpDir("layout") + "/events_by_day"
    val events = Tables.events(spark, sf)
    Layout.writeDatePartitioned(events, "ts", out)

    // layout on disk: p_date=YYYY-MM-DD subdirectories
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("p_date="))
    val days = events.select(to_date(col("ts")).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(dirs.map(_.stripPrefix("p_date=")).sorted.toSeq === days.toSeq)

    val day = days(days.length / 2)
    val pruned = Layout.readDay(spark, out, day)
    // execute THIS DataFrame's plan (count() would compile a separate
    // execution whose scan metrics scanEvidence can't see)
    val rows = pruned.collect().length.toLong

    val (pf, numFiles) = Layout.scanEvidence(pruned)
    assert(pf > 0, "filter on the partition column must become a PartitionFilter")
    val allFiles = spark.read.parquet(out).inputFiles.length
    val dayFiles = new java.io.File(s"$out/p_date=$day").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(numFiles === dayFiles.toLong,
      s"pruned scan read $numFiles files, expected the $dayFiles in the partition (table has $allFiles)")
    assert(numFiles < allFiles)

    // parity with the unpartitioned filter
    val direct = events.filter(to_date(col("ts")).cast("string") === day).count()
    assert(rows === direct)
  }
}
