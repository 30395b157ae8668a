package graft

import org.apache.spark.sql.SparkSession

/** Focused per-query re-measurement: `runMain graft.MicroBench q52_…
  * [q01_… …]` times ONLY the named queries (n=5, min + all runs
  * printed) on `SPARK_GRAFT_SF_DIR`. Use to separate a real regression
  * from host contention — the full Bench's numbers on a loaded host
  * can swing several × (see Bench's methodology note); this isolates
  * one query with nothing else in the JVM's recent GC history. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MicroBench <query_name> [more…]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach(once) // warm-up pass, JVM + codegen
    args.foreach { name =>
      val runs = (1 to 5).map { _ => System.gc(); once(name) }
      println(f"MICRO $name min=${runs.min}%.3f " +
        s"runs=[${runs.map(r => f"$r%.2f").mkString(", ")}]")
    }
    spark.stop()
  }
}
