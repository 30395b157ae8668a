package graft

import org.apache.spark.sql.functions._

/** Every query must tolerate EMPTY input tables — the sf→0 limit. At
  * warehouse scale this is not hypothetical: a new tenant's first day,
  * a partition-pruned scan matching nothing, a source outage leaving
  * an empty landing date. The failure modes this flushes out are the
  * driver-side ones a non-empty SF can never hit: a `.head` on an
  * empty collect (bloom bitsets, min/max grids, control-plane date
  * lists), a division by a zero corpus total, a `max()` null
  * propagating into a cast.
  *
  * Queries are RUN (noop write — full execution, not just analysis)
  * against a directory of schema-identical empty tables. The contract
  * is "no crash"; result rows are free to be empty or carry explicit
  * zero/null aggregates (DuckDB differential at a real SF pins
  * values; this pins total-function behavior at the boundary).
  */
class EmptyInputSpec extends SparkTestBase {

  /** Schema-identical empty copies of every sf table, built once. */
  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val d = tmpDir("graft-empty-sf")
    new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
      .foreach { t =>
        val schema = spark.read.parquet(s"$src/$t").schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .coalesce(1).write.parquet(s"$d/$t")
      }
    d
  }

  /** sf0.001 plus adversarial rows real data never contains: empty /
    * whitespace-only / single-char / null document text (token counts
    * and shingle widths hit zero), duplicate empty contents, and a
    * ZERO embedding vector (cosine norm 0 — the classic ANN division
    * hazard). Appended, not substituted, so every query still sees its
    * normal distribution alongside the poison rows. */
  private lazy val degenerateDir: String = {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val d = tmpDir("graft-degen-sf")
    new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
      .foreach { t =>
        val base = spark.read.parquet(s"$src/$t")
        val out = t match {
          case "documents.parquet" =>
            val poison = Seq(
              (900001L, "", "en", "srcX", 0L),
              (900002L, "   ", "en", "srcX", 3L),
              (900003L, "a", "en", "srcX", 1L),
              (900004L, "word", "en", "srcX", 4L),
              (900005L, "", "en", "srcX", 0L)) // duplicate empty content
              .toDF("doc_id", "text", "lang", "source", "n_chars")
              .union(Seq(900006L).toDF("doc_id")
                .select(col("doc_id"), lit(null).cast("string").as("text"),
                  lit("en").as("lang"), lit("srcX").as("source"),
                  lit(0L).as("n_chars")))
            base.unionByName(poison.select(base.columns.map(col): _*))
          case "embeddings.parquet" =>
            val zero = Seq((900001L, Array.fill(64)(0.0f), 5))
              .toDF("vec_id", "embedding", "label")
            base.unionByName(zero.select(base.columns.map(col): _*))
          case _ => base
        }
        out.coalesce(1).write.parquet(s"$d/$t")
      }
    d
  }

  private def sweep(dir: String, what: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator.take(2).mkString(" | "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on $what:\n  " +
        failures.mkString("\n  "))
  }

  test("all queries execute on empty tables without throwing") {
    sweep(emptyDir, "empty input")
  }

  test("all queries tolerate degenerate text and zero embeddings") {
    sweep(degenerateDir, "degenerate rows")
  }
}
