package graft

import org.apache.spark.sql.SparkSession

/** SQL entry point: registers every harness table as a temp view so
  * the whole surface is reachable through `spark.sql(...)` — the
  * reference's users speak SQL (psql / embedded strings), and every
  * `SparkEntry.oracleSql` statement is ANSI SQL that runs verbatim
  * against these views (modulo engine-specific list functions).
  */
object Views {
  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    Names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir)
      else Tables.table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
  }
}
