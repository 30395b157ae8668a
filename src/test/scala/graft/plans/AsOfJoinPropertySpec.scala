package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test: [[AsOfJoinExec]]'s streamed merge must
  * agree with the composed candidates-then-argmax formulation (range
  * theta-join + window) on generated series — duplicate left
  * timestamps, key groups split across partitions, keys with no right
  * rows, and null keys/timestamps included. Deterministic seeds; the
  * right side is unique per (key, ts) as the operator's tie-break
  * contract requires. */
class AsOfJoinPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  // small key/ts domains force collisions: duplicate left ts per key,
  // multiple rows per instant; null keys/ts never match
  private val leftGen = for {
    k <- Gen.option(Gen.choose(0L, 7L))
    ts <- Gen.option(Gen.choose(0L, 40L))
  } yield (k, ts)

  private val rightGen = for {
    k <- Gen.choose(0L, 5L) // keys 6, 7 exist only on the left
    ts <- Gen.choose(0L, 40L)
  } yield (k, ts)

  test("streamed merge ≡ theta-join + argmax over generated series") {
    Seq(11L, 22L, 33L).foreach { seed =>
      val leftRows = sample(leftGen, 120, seed).zipWithIndex
        .map { case ((k, ts), i) =>
          (i.toLong, k, ts.map(t => new java.sql.Timestamp(t * 1000))) }
      val rightRows = sample(rightGen, 60, seed + 1000).distinct
        .map { case (k, ts) => (k, new java.sql.Timestamp(ts * 1000), s"v$k-$ts") }

      val l = leftRows.toDF("id", "k", "lts")
      val r = rightRows.toDF("k", "rts", "tag")

      val viaOp = AsOf.join(l, r, Seq("k"), "lts", "rts")
        .toDF("id", "k", "lts", "rk", "rts", "tag")
        .select("id", "tag")
        .collect().map(row => row.getLong(0) -> Option(row.getString(1))).toMap

      // reference: every candidate pair, keep the max-rts one per left row
      val w = Window.partitionBy("id").orderBy(col("rts").desc)
      val viaCompose = l.join(r.withColumnRenamed("k", "jk"),
          col("k") === col("jk") && col("rts") <= col("lts"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("id", "tag")
        .collect().map(row => row.getLong(0) -> Option(row.getString(1))).toMap

      assert(viaOp.size === 120 && viaOp === viaCompose, s"seed $seed diverged")
    }
  }
}
