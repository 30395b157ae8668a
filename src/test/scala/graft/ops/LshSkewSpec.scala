package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Adversarial bucket-skew behavior of the LSH candidate generators:
  * one degenerate band key (1000 byte-identical docs — boilerplate)
  * must not produce a quadratic within-bucket self-join when the cap
  * is configured; normal near-dup pairs in healthy buckets are
  * unaffected either way. */
class LshSkewSpec extends SparkTestBase {

  import spark.implicits._

  private val boiler = "lorem ipsum dolor sit amet consectetur adipiscing " +
    "elit sed do eiusmod tempor incididunt ut labore et dolore magna"
  private val pairA = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra"
  private val pairB = pairA.replace("november", "NOVEMBER-CHANGED")

  /** 1000 identical boilerplate docs (ids 100+) + one honest near-dup
    * pair (ids 0, 1). */
  private lazy val dir: String = {
    val d = tmpDir("skewdocs")
    val hot = (100L until 1100L).map(i => (i, boiler, "en", s"s$i", 1L))
    val docs = (Seq((0L, pairA, "en", "s0", 1L), (1L, pairB, "en", "s1", 1L)) ++ hot)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")
    d
  }

  test("capped hot bucket is excluded from candidates; healthy pairs survive") {
    spark.conf.set(LshSkew.MaxBucketConf, "50")
    try {
      val pairs = Dedup.minhashPairs(spark, dir)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the 1000-doc bucket (499,500 within-bucket pairs) was capped out
      assert(!pairs.exists(p => p._1 >= 100L || p._2 >= 100L),
        "over-cap bucket leaked candidates")
      // the honest near-dup pair lives in small buckets and is untouched
      assert(pairs === Set((0L, 1L)))
    } finally spark.conf.unset(LshSkew.MaxBucketConf)
  }

  test("truncation is surfaced to callers via observedSkew, not just logs") {
    spark.conf.set(LshSkew.MaxBucketConf, "50")
    LshSkew.resetObserved(spark)
    try {
      Dedup.minhashPairs(spark, dir).count()
      // the observe() counters arrive via an ASYNC QueryExecutionListener
      // — drain the bus before reading, exactly as Verify does (reading
      // immediately races the delivery and flakes)
      org.apache.spark.sql.graftbridge.GraftBridge
        .waitListenerBusEmpty(spark, 30000L)
      val truncated = LshSkew.truncatedFamilies(spark)
      assert(truncated.contains("minhash"),
        s"minhash cap must report dropped rows, got $truncated")
      val s = truncated("minhash")
      assert(s.overCapRows >= 1000L, "all 1000 hot-bucket rows were dropped")
      assert(s.maxBucket >= 1000L, "high-water bucket size recorded")
    } finally {
      spark.conf.unset(LshSkew.MaxBucketConf)
      LshSkew.resetObserved(spark)
    }
  }

  test("strict mode fails the query on an over-cap bucket instead of truncating") {
    spark.conf.set(LshSkew.MaxBucketConf, "50")
    spark.conf.set(LshSkew.StrictConf, "true")
    try {
      val e = intercept[Exception] {
        Dedup.minhashPairs(spark, dir).count()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
      assert(msgs(e).exists(_.contains("LSH strict mode")),
        s"expected the strict-mode assertion, got: ${e.getMessage}")
      // healthy data passes untouched in strict mode
      val d = tmpDir("strictok")
      Seq((0L, pairA, "en", "s0", 1L), (1L, pairB, "en", "s1", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$d/documents.parquet")
      assert(Dedup.minhashPairs(spark, d).count() == 1L)
    } finally {
      spark.conf.unset(LshSkew.MaxBucketConf)
      spark.conf.unset(LshSkew.StrictConf)
      LshSkew.resetObserved(spark)
    }
  }

  test("default cap leaves small-bucket results identical") {
    // 30 identical docs: under the default cap, all pairs produced
    val d = tmpDir("smalldocs")
    ((0L until 30L).map(i => (i, boiler + s" tail", "en", s"s$i", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val n = Dedup.minhashPairs(spark, d).count()
    assert(n === 30L * 29L / 2L)
  }

  test("hyperplane generator honors the cap") {
    // 64-dim embeddings: 200 copies of one vector (all land in the same
    // bucket of every table) + 2 near-identical outliers
    val d = tmpDir("skewemb")
    val base = Array.tabulate(64)(j => 0.1f * ((j % 7) - 3))
    val outlier = Array.tabulate(64)(j => 0.5f * ((j % 5) - 2))
    val outlier2 = outlier.clone(); outlier2(0) = outlier(0) + 0.001f
    val rows = (100L until 300L).map(i => (i, base)) ++
      Seq((0L, outlier), (1L, outlier2))
    rows.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    spark.conf.set(LshSkew.MaxBucketConf, "50")
    try {
      val pairs = Similarity.embNearDup(spark, d)
        .select("vec_a", "vec_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!pairs.exists(p => p._1 >= 100L || p._2 >= 100L))
      assert(pairs === Set((0L, 1L)))
    } finally spark.conf.unset(LshSkew.MaxBucketConf)
  }
}
