package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Bucket-skew guard for the LSH candidate generators (q28/q31/q32/q35).
  *
  * An LSH self-join is quadratic WITHIN each bucket. On well-behaved
  * data buckets hold a handful of rows, but a degenerate band key —
  * boilerplate-heavy shards, a constant column, an adversarial
  * template — concentrates millions of rows on one key and turns a
  * single reducer quadratic: the classic 100 TB dedup scale-killer.
  *
  * Mitigation: cap bucket size. Rows in buckets larger than
  * `spark.graft.lsh.maxBucket` (default 10000, far above any legitimate
  * near-dup cluster in the harness data) are excluded from candidate
  * generation, and the truncation is NEVER silent: an
  * `observe()`-metric on the capped frame counts over-cap rows and the
  * max bucket size per action, and a once-per-session listener logs any
  * non-zero counts. Giant buckets are dominated by degenerate keys, and
  * byte-identical payloads inside them are still caught by exact
  * dedup (q27 fingerprint / exact hash-groupBy), which is the correct
  * tool for mass-duplicated boilerplate anyway.
  *
  * Plan shape: the size is computed with a window over EXACTLY the
  * candidate-join keys, so it rides the join's own hash exchange
  * (Window preserves its child's partitioning — no extra shuffle), and
  * the identical exchange below both self-join sides still collapses
  * via ReusedExchange.
  */
object LshSkew {

  val MaxBucketConf = "spark.graft.lsh.maxBucket"
  val MaxBucketDefault = 10000L

  def maxBucket(s: SparkSession): Long =
    s.conf.get(MaxBucketConf, MaxBucketDefault.toString).toLong

  /** Filter `bands` down to rows whose (keys…) bucket is within the
    * configured cap; observe + log what was dropped. */
  def capBuckets(bands: DataFrame, keys: Seq[String], family: String): DataFrame = {
    val s = bands.sparkSession
    ensureListener(s)
    val cap = maxBucket(s)
    val w = Window.partitionBy(keys.map(col): _*)
    bands
      .withColumn("__bn", count(lit(1)).over(w))
      .observe(s"graft_lsh_skew_$family",
        sum(when(col("__bn") > cap, 1L).otherwise(0L)).as("over_cap_rows"),
        max(col("__bn")).as("max_bucket"))
      .filter(col("__bn") <= cap)
      .drop("__bn")
  }

  // One listener per session; WeakHashMap so stopped sessions can be
  // collected. The listener surfaces every graft_lsh_skew_* observation
  // and WARNs when a cap actually truncated candidates.
  private val seen: java.util.Set[SparkSession] =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def ensureListener(s: SparkSession): Unit = seen.synchronized {
    if (seen.add(s)) {
      s.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach {
            case (name, row) if name.startsWith("graft_lsh_skew_") =>
              val dropped = row.getAs[Long]("over_cap_rows")
              val msg = s"$name: over_cap_rows=$dropped " +
                s"max_bucket=${row.getAs[Long]("max_bucket")}"
              if (dropped > 0) log.warn(s"LSH bucket cap truncated candidates — $msg")
              else log.info(msg)
            case _ =>
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
  }
}
