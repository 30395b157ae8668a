package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned table layout — the storage-side half of the
  * scan-reduction story ([[Pruning]] is the query-side half).
  *
  * At 100 TB the single biggest lever is never reading the data at
  * all: a fact table written `partitionBy(date_col)` turns every
  * date-range predicate into DIRECTORY pruning (Spark plans
  * `PartitionFilters` on the scan and lists only matching
  * subdirectories — zero footer reads for excluded dates), which
  * composes with row-group min/max skipping ([[Pruning]] q86 z-order)
  * INSIDE each partition for secondary columns.
  *
  * `LayoutSpec` drives this end-to-end: writes the events stream
  * partitioned by day, proves the filtered scan's `PartitionFilters`
  * is non-empty and its input files are exactly the matching
  * partition's, and checks result equality against the unpartitioned
  * scan. (No `queries` entry: layout is a sink-side operator — same
  * test-verified category as the reference's CSV/JDBC sinks.)
  */
object Layout {

  /** Write `df` as a Hive-partitioned parquet table on `dateCol`'s
    * date. Partition count = distinct days — bounded, so no
    * small-files explosion; within a partition files split naturally
    * at `maxPartitionBytes` for parallel reads. */
  def writeDatePartitioned(df: DataFrame, dateCol: String,
      path: String): Unit =
    df.withColumn("p_date", to_date(col(dateCol)).cast("string"))
      .write.partitionBy("p_date").mode("overwrite").parquet(path)

  /** Read back one day: the filter on the partition column must prune
    * at LISTING time (assertPruned proves it did). */
  def readDay(s: SparkSession, path: String, day: String): DataFrame =
    s.read.parquet(path).filter(col("p_date") === day)

  /** The scan's partition-pruning evidence: (partition-filter count,
    * numFiles actually scanned — valid after an action ran). A
    * test/ops harness hook, not a data path. */
  def scanEvidence(df: DataFrame): (Int, Long) = {
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val pf = scans.map(_.partitionFilters.size).sum
    val nf = scans.map(s =>
      s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    (pf, nf)
  }
}
