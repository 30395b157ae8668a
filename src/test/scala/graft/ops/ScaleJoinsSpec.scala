package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Plan-level guarantees of the scale-join techniques. */
class ScaleJoinsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed join runs with zero shuffle exchange") {
    // managed tables land in ./spark-warehouse (static config; ignored
    // by git, dropped below). Clear catalog AND any stale location
    // from a previous aborted run.
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    ScaleJoins.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    ScaleJoins.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)

    val j = ScaleJoins.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, plan:\n$plan")
    // and it is correct
    val expected = orders.join(lineitem, Seq("o_orderkey")).count()
    assert(j.count() === expected)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("salted count/sum equals the direct aggregation") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val direct = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_value"))
    val salted = ScaleJoins.saltedCountSum(li, "l_orderkey", "l_quantity", 4)
    assert(salted.join(direct,
      Seq("l_orderkey", "n_rows", "sum_value"), "left_anti").count() === 0)
    assert(salted.count() === direct.count())
  }

  test("salted join equals the plain join") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val part = Tables.part(spark, dir).select("p_partkey", "p_name")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
    val salted = ScaleJoins.saltedJoin(li, part, "l_partkey", 4)
    assert(salted.count() === plain.count())
    // spot-check content equality on an aggregate signature
    val sig = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(count(lit(1)), sum(crc32(col("p_name")))).head()
    assert(sig(salted) === sig(plain))
  }

  test("q180: placements replay in plain Scala; loads conserve; skew is per-scheme") {
    val sf = "/root/testdata/sf0.001"
    val out = ScaleJoins.shardBalance(spark, sf).collect()
      .map(r => (r.getAs[String]("scheme"), r.getAs[Long]("shard"),
        r.getAs[Long]("n"), r.getAs[Long]("skew_milli")))
    assert(out.nonEmpty)
    def h8(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    }
    val keys = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getAs[Long]("doc_id").toString)
    val nDocs = keys.length.toLong
    val modLoads = keys.groupBy(k => h8(k) % ScaleJoins.NShards)
      .view.mapValues(_.length.toLong).toMap
    val hrwLoads = keys.groupBy { k =>
      val hs = (0 until ScaleJoins.NShards).map(i => h8(s"${k}_$i"))
      hs.indexOf(hs.max).toLong
    }.view.mapValues(_.length.toLong).toMap
    val expect = Map("mod" -> modLoads, "rendezvous" -> hrwLoads)
    out.groupBy(_._1).foreach { case (scheme, rows) =>
      val loads = expect(scheme)
      assert(rows.map(_._3).sum === nDocs, s"$scheme conserves")
      rows.foreach { case (_, shard, n, skew) =>
        assert(n === loads(shard), s"$scheme shard $shard")
        assert(skew ===
          loads.values.max * 1000L * ScaleJoins.NShards / nDocs)
      }
    }
  }
}
