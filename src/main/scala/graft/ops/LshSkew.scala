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

  /** Strict mode: a bucket over the cap FAILS the query (executor-side
    * `assert_true`) instead of being truncated. For pipelines where
    * silently weaker recall is worse than an error — the operator then
    * either raises the cap deliberately or pre-cleans the degenerate
    * key. Default off: the cap + surfaced metric is the scale-safe
    * production posture. */
  val StrictConf = "spark.graft.lsh.strict"

  /** Cap for `family`, per-family override first: a conf like
    * `spark.graft.lsh.maxBucket.copurchase` tunes ONE candidate
    * generator; the bare [[MaxBucketConf]] stays the global default.
    * Without the override, raising the global for a legitimate large
    * near-dup cluster would silently unbound every OTHER quadratic
    * generator sharing the knob (the graph basket cap among them). */
  def maxBucket(s: SparkSession, family: String): Long =
    s.conf.getOption(s"$MaxBucketConf.$family")
      .orElse(s.conf.getOption(MaxBucketConf))
      .map(_.toLong).getOrElse(MaxBucketDefault)

  def strict(s: SparkSession): Boolean =
    s.conf.get(StrictConf, "false").equalsIgnoreCase("true")

  /** Filter `bands` down to rows whose (keys…) bucket is within the
    * configured cap; observe + log + record what was dropped. In
    * strict mode an over-cap bucket raises instead of truncating. */
  def capBuckets(bands: DataFrame, keys: Seq[String], family: String): DataFrame = {
    val s = bands.sparkSession
    ensureListener(s)
    val cap = maxBucket(s, family)
    val w = Window.partitionBy(keys.map(col): _*)
    val sized = bands
      .withColumn("__bn", count(lit(1)).over(w))
      .observe(s"graft_lsh_skew_$family",
        sum(when(col("__bn") > cap, 1L).otherwise(0L)).as("over_cap_rows"),
        max(col("__bn")).as("max_bucket"))
    val capped =
      if (strict(s)) {
        // Name the conf key that actually RESOLVED the cap: with a
        // per-family override set, telling the operator to raise the
        // bare global (which the override shadows) sends them in a
        // loop of raising a knob that changes nothing.
        val capKey =
          if (s.conf.getOption(s"$MaxBucketConf.$family").isDefined)
            s"$MaxBucketConf.$family"
          else MaxBucketConf
        // assert_true is NULL when the predicate holds, raises otherwise;
        // the isNull filter keeps every row that passed the assertion.
        sized.filter(assert_true(col("__bn") <= cap,
          concat(lit(s"LSH strict mode [$family]: bucket on (" +
            keys.mkString(", ") + s") exceeds $capKey=$cap: size="),
            col("__bn"))).isNull)
      } else sized.filter(col("__bn") <= cap)
    capped.drop("__bn")
  }

  // ---- surfaced metrics ----------------------------------------------
  // The observe() counters land here via the QueryExecutionListener, so
  // callers (Verify, tests, operators embedding the generators) can READ
  // what the cap did instead of digging through logs. Keyed by
  // (sessionUUID, family); dropped rows accumulate across actions, max
  // bucket size keeps the high-water mark.

  /** (over_cap_rows summed, max_bucket high-water) per family. */
  final case class Skew(overCapRows: Long, maxBucket: Long)

  // Counters are keyed by the SESSION OBJECT through a WeakHashMap, not
  // by a derived string key: a string registry keyed by the
  // identity-hash fallback could be REUSED by a later session once the
  // original is collected (merging another session's drop counters),
  // and evicting only at application end left dead sessions' entries
  // resident for the JVM's lifetime. With a weak key the entry dies
  // with the session — no reuse window, no app-lifetime growth. The
  // value (a per-family TrieMap) must never reference the session, or
  // the weak key could never be collected.
  private val recorded =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Skew]]()

  private def famMap(s: SparkSession)
      : scala.collection.concurrent.TrieMap[String, Skew] =
    recorded.synchronized {
      var m = recorded.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Skew]
        recorded.put(s, m)
      }
      m
    }

  /** What the caps observed in this session so far, by family. */
  def observedSkew(s: SparkSession): Map[String, Skew] = famMap(s).toMap

  /** Families whose cap actually dropped candidate rows this session. */
  def truncatedFamilies(s: SparkSession): Map[String, Skew] =
    observedSkew(s).filter(_._2.overCapRows > 0)

  def resetObserved(s: SparkSession): Unit = famMap(s).clear()

  // One listener per session; WeakHashMap so stopped sessions can be
  // collected. The listener surfaces every graft_lsh_skew_* observation
  // and WARNs when a cap actually truncated candidates.
  private val seen: java.util.Set[SparkSession] =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def ensureListener(s: SparkSession): Unit = seen.synchronized {
    if (seen.add(s)) {
      // The listener captures the session's per-family TrieMap, NOT the
      // session itself: the session strongly references the listener
      // (via listenerManager), so a session capture would be a harmless
      // cycle, but capturing only the value keeps the WeakHashMap
      // invariant obvious — nothing reachable from the value pins the
      // weak key.
      val fams = famMap(s)
      s.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach {
            case (name, row) if name.startsWith("graft_lsh_skew_") =>
              val family = name.stripPrefix("graft_lsh_skew_")
              val dropped = row.getAs[Long]("over_cap_rows")
              val maxB = row.getAs[Long]("max_bucket")
              fams.updateWith(family) {
                case Some(p) => Some(Skew(p.overCapRows + dropped,
                  math.max(p.maxBucket, maxB)))
                case None => Some(Skew(dropped, maxB))
              }
              val msg = s"$name: over_cap_rows=$dropped max_bucket=$maxB"
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
