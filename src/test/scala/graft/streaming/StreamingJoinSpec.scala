package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream–stream interval join: the drained streamed result must
  * equal the batch interval join on the same data, and only in-window
  * (user-matched) pairs may appear. */
class StreamingJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** user 1: view at 10:00 → purchases at 10:10 (in) and 10:40 (out,
    * > 30 min); a second view at 10:35 catches the 10:40 purchase.
    * user 2: purchase with NO prior view (must not emit).
    * user 3: view with no purchase (must not emit). */
  private val viewRows = Seq(
    (1L, 100L, ts("2026-01-01 10:00:00")),
    (1L, 101L, ts("2026-01-01 10:35:00")),
    (3L, 300L, ts("2026-01-01 10:00:00")))
  private val purchaseRows = Seq(
    (1L, 900L, ts("2026-01-01 10:10:00")),
    (1L, 901L, ts("2026-01-01 10:40:00")),
    (2L, 902L, ts("2026-01-01 10:05:00")))

  private lazy val dirs: (String, String) = {
    val dv = tmpDir("sjoin-views")
    val dp = tmpDir("sjoin-purch")
    viewRows.toDF("user_id", "view_id", "view_ts")
      .coalesce(1).write.parquet(s"$dv/b1.parquet")
    purchaseRows.toDF("user_id", "purchase_id", "purchase_ts")
      .coalesce(1).write.parquet(s"$dp/b1.parquet")
    (dv, dp)
  }

  private def streamed(): Seq[(Long, Long, Long)] = {
    val (dv, dp) = dirs
    val vSchema = spark.read.parquet(s"$dv/b1.parquet").schema
    val pSchema = spark.read.parquet(s"$dp/b1.parquet").schema
    val v = spark.readStream.schema(vSchema).parquet(s"$dv/*.parquet")
    val p = spark.readStream.schema(pSchema).parquet(s"$dp/*.parquet")
    val q = StreamingJoin.attributionJoin(v, p, "10 minutes", 30)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("sjoin-ckpt"))
      .format("memory").queryName("sjoin").outputMode("append")
      .start()
    q.awaitTermination()
    spark.table("sjoin")
      .select("user_id", "view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
  }

  private def batchMirror(): Seq[(Long, Long, Long)] = {
    val v: DataFrame = viewRows.toDF("user_id", "view_id", "view_ts")
    val p = purchaseRows.toDF("user_id", "purchase_id", "purchase_ts")
      .withColumnRenamed("user_id", "p_user")
    v.join(p, col("user_id") === col("p_user") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select("user_id", "view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
  }

  test("streamed interval join ≡ batch mirror; unmatched rows emit nothing") {
    val got = streamed()
    val expect = batchMirror()
    assert(got === expect)
    // the known ground truth, explicitly
    assert(got === Seq((1L, 100L, 900L), (1L, 101L, 901L)))
    // no cross-user or out-of-window pairs
    assert(!got.exists(_._1 == 2L) && !got.exists(_._1 == 3L))
  }
}
