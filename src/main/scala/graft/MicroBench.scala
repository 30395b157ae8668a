package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Focused per-query re-measurement: `runMain graft.MicroBench q52_…
  * [q01_… …]` times ONLY the named queries (default n=7 measured runs
  * after a warm-up pass; `SPARK_GRAFT_MICRO_N` overrides) on
  * `SPARK_GRAFT_SF_DIR`. Use to separate a real regression from host
  * contention — the full Bench's numbers on a loaded host can swing
  * several × (see Bench's methodology note); this isolates one query
  * with nothing else in the JVM's recent GC history.
  *
  * Results are printed per query AND written as one JSON object to
  * `MICROBENCH_OUT.json` so a round can commit them as an artifact
  * (`MICROBENCH_r{N}.json`) instead of quoting numbers in comments —
  * the round-6 verdict's complaint. Include `q01_pricing_summary` in
  * every invocation: it is the pinned host-noise canary ([[Bench
  * .CanaryRefSec]]); its ratio against the quiet-host reference is
  * emitted in the JSON, and the other numbers are only comparable
  * across rounds at similar ratios. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MicroBench <query_name> [more…]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val n = sys.env.getOrElse("SPARK_GRAFT_MICRO_N", "7").toInt
    require(n >= 1, s"SPARK_GRAFT_MICRO_N must be ≥ 1, got $n")
    // SPARK_GRAFT_MICRO_WARMUP=0 skips the warm-up pass: for the
    // multi-minute sf10 scaling points a full extra pass doubles wall
    // clock to amortize codegen/JIT costs that are <1% of a 20-minute
    // run. Default 1 (warm-up on) — sub-second queries NEED it.
    val warm = sys.env.getOrElse("SPARK_GRAFT_MICRO_WARMUP", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // BENCH PARITY (round-12 fix): Bench and Verify run with the
      // pipeline cache ON; MicroBench historically did not, so a
      // multi-referenced subtree (q99's hx ×3, q52's cluster frames)
      // recomputed per reference and an "isolated re-measurement" of
      // an in-suite delta silently compared two different engine
      // configurations — q99 measured 23.5 s isolated vs 2.8 s
      // in-suite on identical code and an only-1.45× host. The
      // invalidate() in once() still forces every run to REBUILD its
      // entries, so nothing is timed warm; the flag only stops
      // within-run recomputation, exactly as in Bench.
      .config(ops.PipelineCache.ConfKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      ops.PipelineCache.invalidate(spark, name)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Same orphan-checkpoint discipline as Bench (one shared window —
    // Bench.withCheckpointSweep): without it, a multi-query invocation
    // leaks each query's terminal checkpoint blocks into the next
    // query's measurement.
    def sweptRuns(name: String, k: Int): Seq[Double] =
      Bench.withCheckpointSweep(spark)(
        (1 to k).map { _ => System.gc(); once(name) })._1
    if (warm > 0) args.foreach(sweptRuns(_, 1)) // warm-up pass, JVM + codegen
    val results = args.map { name =>
      val runs = sweptRuns(name, n)
      println(f"MICRO $name min=${runs.min}%.3f " +
        s"runs=[${runs.map(r => f"$r%.2f").mkString(", ")}]")
      name -> runs
    }
    def med(rs: Seq[Double]): Double = {
      val s = rs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Bench.num, not f"%.4f": the default-locale interpolator would
    // emit comma decimals (invalid JSON) on comma-separator locales.
    val canary = results.collectFirst {
      case (Bench.CanaryQuery, runs) =>
        s""""canary":{"query":"${Bench.CanaryQuery}","min_sec":${Bench.num(runs.min, 4)},""" +
          s""""ref_sec":${Bench.num(Bench.CanaryRefSec, 4)},""" +
          s""""ratio":${Bench.num(runs.min / Bench.CanaryRefSec, 3)}},"""
    }.getOrElse("")
    // Basket ratios for whichever basket members this invocation timed
    // (median only when ≥3 present — a 1–2 member "basket" is just the
    // single-query canary wearing a new name). Refs are Bench's
    // in-suite quiet-host values; micro runs are isolated, so these
    // ratios read systematically LOW vs a full-bench basket — compare
    // micro-to-micro, not micro-to-bench.
    val resultMap = results.toMap
    val basketRatios = Bench.CanaryBasket.flatMap { case (q, ref) =>
      resultMap.get(q).map(runs => q -> runs.min / ref) }
    val basket =
      if (basketRatios.size < 3) ""
      else s""""canary_basket":{"ratio_median":${
        Bench.num(Bench.basketMedian(basketRatios.map(_._2)), 3)},""" +
        s""""ratios":${basketRatios.map { case (q, r) =>
          s""""${Bench.esc(q)}":${Bench.num(r, 3)}""" }.mkString("{", ",", "}")}},"""
    val qs = results.map { case (name, runs) =>
      s""""${Bench.esc(name)}":{"min":${Bench.num(runs.min, 4)},"median":${Bench.num(med(runs), 4)},""" +
        s""""runs":[${runs.map(r => Bench.num(r, 4)).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val json = s"""{"n":$n,"cpus":"${Bench.esc(cpus)}","sf":"${Bench.esc(sfDir)}",$canary$basket"queries":$qs}"""
    println(json)
    Files.writeString(Paths.get("MICROBENCH_OUT.json"), json + "\n")
    spark.stop()
  }
}
