package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.graftbridge.GraftBridge

/** Public DataFrame API over the [[AsOfJoin]] custom operator.
  *
  * {{{
  * AsOf.join(trades, quotes, keys = Seq("symbol"),
  *   leftTs = "trade_ts", rightTs = "quote_ts")
  * }}}
  *
  * attaches to every trade the last quote at-or-before it per symbol
  * (left-outer; unmatched trades keep null quote columns). The
  * operator plans as one Exchange + Sort per side and a streamed
  * O(n+m) per-partition merge — see [[AsOfJoin]].
  *
  * The planner strategy self-installs into the session
  * (`spark.experimental.extraStrategies`), so the API needs no
  * extension wiring; sessions configured with
  * `spark.sql.extensions=graft.plans.GraftExtensions` get the strategy
  * globally as well (double registration is harmless — the strategy
  * matches the node at most once).
  */
object AsOf {

  /** `direction = "backward"` (default): last right row at-or-before
    * each left timestamp. `direction = "forward"`: first right row
    * at-or-after (pandas merge_asof's direction vocabulary).
    *
    * `tieBreak`: right-side columns that deterministically order rows
    * sharing the same (key, ts) — the greatest tiebreak wins backward,
    * the least forward (a lexicographic extension of the timestamp;
    * see [[AsOfJoin]]). Without it, ties resolve to an arbitrary
    * stable-per-run but not run-to-run-stable row. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      direction: String = "backward",
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val spark = left.sparkSession
    // Self-install under a lock on the session's ExperimentalMethods
    // (the RangeJoin.attributionNatural discipline, same reason): the
    // check-then-append on the shared extraStrategies var races under
    // concurrent AsOf.join calls from two threads on one session —
    // double-install is merely redundant (the strategy is idempotent),
    // but a lost concurrent append of a DIFFERENT strategy would not
    // be, and the victim surfaces later as Spark's opaque "No plan
    // for" its node. Sessions wired via GraftExtensions never take
    // this path at all.
    val exp = spark.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(AsOfJoinStrategy))
        exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    }

    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of join sides share attribute instances (self-join on the same " +
        "Dataset object) — derive each side from its own read/select")

    // resolve like Spark does (honors spark.sql.caseSensitive) and
    // fail on ambiguity — find(_.name == name) would silently bind the
    // first of two same-named columns and as-of join on the wrong one
    val resolver = spark.sessionState.conf.resolver
    def attr(out: Seq[Attribute], name: String, side: String): Attribute =
      out.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => sys.error(
          s"$side side has no column '$name' (has: ${out.map(_.name).mkString(", ")})")
        case many => sys.error(
          s"$side side has ${many.size} columns named '$name' — disambiguate " +
            "with a select/alias before the as-of join")
      }

    val lk = keys.map(attr(lPlan.output, _, "left"))
    val rk = keys.map(attr(rPlan.output, _, "right"))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name} ${a.dataType} vs ${b.name} ${b.dataType}")
    }
    val lt = attr(lPlan.output, leftTs, "left")
    val rt = attr(rPlan.output, rightTs, "right")
    require(lt.dataType == rt.dataType,
      s"timestamp type mismatch: ${lt.dataType} vs ${rt.dataType}")

    val tb = tieBreak.map(attr(rPlan.output, _, "right"))
    GraftBridge.ofRows(spark, AsOfJoin(lPlan, rPlan, lk, rk, lt, rt,
      forward = direction == "forward", rightTieBreak = tb))
  }
}
