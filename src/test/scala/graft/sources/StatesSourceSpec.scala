package graft.sources

import graft.SparkTestBase
import graft.extract.{HttpBackend, HttpReply}
import org.apache.spark.sql.functions._

/** The DSv2 states source against a canned HTTP backend: partition
  * math, boundary ownership, auth flow, pruning, and that its output
  * feeds the staging kernel exactly like the CSV path. */
class StatesSourceSpec extends SparkTestBase {

  /** Serves states at fixed latitudes; honors bbox filtering with the
    * API's INCLUSIVE bounds, so split boundaries genuinely duplicate. */
  private class FakeApi extends HttpBackend {
    val tokenPosts = new java.util.concurrent.atomic.AtomicInteger
    val gets = new java.util.concurrent.CopyOnWriteArrayList[Map[String, String]]
    val auths = new java.util.concurrent.CopyOnWriteArrayList[String]

    // (icao24, lat) — 50.0 sits exactly on the 2-way split line of
    // [40, 60]; the null-lat state must appear exactly once too.
    private val states = Seq(
      ("aaa111", Some(40.0)), ("bbb222", Some(49.9)), ("ccc333", Some(50.0)),
      ("ddd444", Some(55.5)), ("eee555", Some(60.0)), ("fff666", None))

    override def postForm(url: String, form: Map[String, String]): HttpReply = {
      tokenPosts.incrementAndGet()
      assert(form("grant_type") == "client_credentials")
      HttpReply(200, """{"access_token": "tok-123"}""")
    }

    override def get(url: String, params: Map[String, String],
        headers: Map[String, String]): HttpReply = {
      gets.add(params); headers.get("Authorization").foreach(auths.add)
      val lo = params.get("lamin").map(_.toDouble).getOrElse(-90.0)
      val hi = params.get("lamax").map(_.toDouble).getOrElse(90.0)
      val rows = states.collect {
        case (id, lat) if lat.forall(v => v >= lo && v <= hi) =>
          val latJs = lat.map(_.toString).getOrElse("null")
          s"""["$id","CALL  ","Svizra",null,1700000000,7.5,$latJs,1000.5,false,
             |250.1,90.0,0.5,null,1050.0,"7000",true,0]""".stripMargin.replace("\n", "")
      }
      HttpReply(200, s"""{"time": 1700000000, "states": [${rows.mkString(",")}]}""")
    }
  }

  private def read(api: FakeApi, splits: Int, extra: (String, String)*) = {
    val name = s"fake-${System.identityHashCode(api)}"
    OpenSkyStatesSource.registerBackend(name, api)
    var r = spark.read.format("opensky-states")
      .option("base_url", "https://api.test").option("endpoint", "/states/all")
      .option("lamin", "40").option("lomin", "5")
      .option("lamax", "60").option("lomax", "10")
      .option("splits", splits.toString)
      .option("backend", name)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("split fetch covers the bbox exactly once, boundary and null-lat included") {
    val api = new FakeApi
    val df = read(api, 4)
    val got = df.select("icao24", "latitude").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(got.map(_._1).sorted ===
      Seq("aaa111", "bbb222", "ccc333", "ddd444", "eee555", "fff666"))
    assert(got.toMap.apply("fff666").isEmpty, "null lat renders as null")
    assert(api.gets.size() === 4, "one REST call per partition")
    // every interior band asked for its own sub-bbox
    val bands = (0 until api.gets.size).map(i => api.gets.get(i))
      .map(p => (p("lamin").toDouble, p("lamax").toDouble)).sortBy(_._1)
    assert(bands.head._1 === 40.0 && bands.last._2 === 60.0)
  }

  test("null-lat ownership is exactly-once at every split count") {
    // FakeApi returns the position-less state to EVERY band's bbox
    // reply (the documented API assumption); the id-hash owner must be
    // the single emitter whatever the fan-out.
    Seq(1, 2, 3, 5).foreach { n =>
      val ids = read(new FakeApi, n).select("icao24").collect().map(_.getString(0))
      assert(ids.count(_ == "fff666") === 1,
        s"splits=$n must emit the null-lat row exactly once")
    }
  }

  test("schema is the raw 17-string-column CSV schema") {
    val df = read(new FakeApi, 1)
    assert(df.schema === graft.etl.FlightStates.rawSchema)
  }

  test("OAuth: one driver-side token post, bearer on every partition GET") {
    val api = new FakeApi
    read(api, 3, "token_url" -> "https://auth.test/token",
      "client_id" -> "id", "client_secret" -> "sec").count()
    assert(api.tokenPosts.get() === 1, "token is acquired once per scan")
    assert(api.auths.size() === 3)
    (0 until api.auths.size).foreach(i =>
      assert(api.auths.get(i) === "Bearer tok-123"))
  }

  test("column pruning reaches the scan") {
    val df = read(new FakeApi, 2).select("icao24")
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("icao24"))
    assert(df.collect().length === 6)
  }

  test("empty / missing states payload yields zero rows (F6)") {
    val api = new FakeApi {
      override def get(url: String, params: Map[String, String],
          headers: Map[String, String]): HttpReply =
        HttpReply(200, """{"time": 1, "states": null}""")
    }
    assert(read(api, 1).count() === 0)
  }

  test("micro-batch stream: one snapshot poll per trigger, banded fetch, fresh token") {
    val api = new FakeApi
    val name = s"fake-stream-${System.identityHashCode(api)}"
    OpenSkyStatesSource.registerBackend(name, api)
    val ckpt = tmpDir("states-ckpt")
    val out = tmpDir("states-out")
    // parquet sink: the memory sink rejects checkpoint recovery, and
    // the restart leg below resumes from the checkpoint
    def start() = spark.readStream.format("opensky-states")
      .option("base_url", "https://api.test").option("endpoint", "/states/all")
      .option("lamin", "40").option("lomin", "5")
      .option("lamax", "60").option("lomax", "10")
      .option("splits", "2")
      .option("token_url", "https://auth.test/token")
      .option("client_id", "id").option("client_secret", "sec")
      .option("backend", name)
      .load()
      .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).outputMode("append")
      .start()

    val q1 = start(); q1.awaitTermination()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst === 6, "first poll lands the full snapshot once")
    assert(api.tokenPosts.get() === 1, "one token per micro-batch")
    assert(api.gets.size() === 2, "banded fetch: one GET per split")

    // restart from the checkpoint: a NEW poll fetches the live snapshot
    // again (cron-tick semantics) with a fresh token
    val q2 = start(); q2.awaitTermination()
    assert(spark.read.parquet(out).count() === afterFirst + 6)
    assert(api.tokenPosts.get() === 2)
  }

  test("source output feeds the staging kernel like the CSV path") {
    val cleaned = graft.etl.FlightStates.transform(
      graft.etl.FlightStates.withAudit(read(new FakeApi, 2), "rest://states",
        java.sql.Timestamp.valueOf("2026-08-12 00:00:00")))
    val row = cleaned.filter(col("icao24") === "ccc333").head()
    assert(row.getAs[Double]("latitude") === 50.0)
    assert(row.getAs[Boolean]("on_ground") === false)
    assert(row.getAs[Boolean]("spi") === true)
    assert(row.getAs[Int]("position_source") === 0)
    assert(cleaned.count() === 6)
  }
}
