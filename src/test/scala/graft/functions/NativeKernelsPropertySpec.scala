package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: every native graftbridge kernel must agree with the
  * builtin Spark formulation it replaced, over ScalaCheck-generated
  * inputs evaluated in one DataFrame pass (deterministic seed — the
  * suite never flakes; bump the seed to widen the search). */
class NativeKernelsPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(0, 24)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ',', '"', 'é', '中', '\t')))
  } yield cs.mkString

  test("Md5PrefixLong == conv(substring(md5(x),1,n),16,10) for widths 8 and 15") {
    val df = sample(wordGen, 400, 1L).toDF("s")
    val mism = df.select(
        ArrayFunctions.md5Prefix(col("s"), 8).as("n8"),
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("b8"),
        ArrayFunctions.md5Prefix(col("s"), 15).as("n15"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("b15"))
      .filter(col("n8") =!= col("b8") || col("n15") =!= col("b15"))
    assert(mism.count() === 0)
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct sets") {
    val setGen = Gen.listOf(Gen.choose(0, 400)).map(_.distinct.sorted)
    val rows = sample(Gen.zip(setGen, setGen), 300, 2L)
    val df = rows.toDF("a", "b")
    val mism = df.select(
        ArrayFunctions.sortedIntersectCount(col("a"), col("b")).as("n"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("bi"))
      .filter(col("n") =!= col("bi"))
    assert(mism.count() === 0)
  }

  test("SortedPackedDotLong == the map-join dot product on packed sparse vectors") {
    // keys cover BOTH sign halves (≥ 2^31 packs negative — the
    // signed-sort/merge-order regression lives exactly there)
    val entryGen = Gen.zip(
      Gen.oneOf(Gen.choose(0L, 40L), Gen.choose((1L << 32) - 40L, (1L << 32) - 1L)),
      Gen.choose(0L, 1000000L))
    val sparseGen = Gen.listOf(entryGen)
      .map(_.groupBy(_._1).view.mapValues(_.head._2).toList)
    val rows = sample(Gen.zip(sparseGen, sparseGen), 300, 7L)
      .map { case (a, b) =>
        val expected = a.flatMap { case (k, wa) =>
          b.collectFirst { case (`k`, wb) => wa * wb } }.sum
        (a.map { case (k, w) => (k << 32) + w }.sorted,
          b.map { case (k, w) => (k << 32) + w }.sorted, expected)
      }
    val mism = rows.toDF("a", "b", "expected")
      .select(ArrayFunctions.sortedPackedDotLong(col("a"), col("b")).as("n"),
        col("expected"))
      .filter(col("n") =!= col("expected"))
    assert(mism.count() === 0)
  }

  test("DotProductLong == aggregate(zip_with(a,b,*)) on bounded vectors") {
    val vecGen = Gen.listOfN(64, Gen.choose(-4000L, 4000L))
    val df = sample(Gen.zip(vecGen, vecGen), 200, 3L).toDF("a", "b")
    val mism = df.select(
        ArrayFunctions.dotProductLong(col("a"), col("b")).as("n"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("bi"))
      .filter(col("n") =!= col("bi"))
    assert(mism.count() === 0)
  }

  test("SimHash60 == the higher-order-function vote fold") {
    val hashGen = Gen.listOf(Gen.choose(0L, (1L << 60) - 1))
    val df = sample(hashGen, 250, 4L).toDF("hs")
    val masks = array((0 until 60).map(p => lit(1L << p)): _*)
    val hof = aggregate(
      zip_with(
        aggregate(col("hs"), array_repeat(lit(0L), 60),
          (acc, h) => zip_with(acc, masks, (cnt, m) =>
            cnt + when(h.bitwiseAND(m) > 0, lit(1L)).otherwise(lit(-1L)))),
        masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
    val mism = df.select(ArrayFunctions.simhash60(col("hs")).as("n"), hof.as("bi"))
      .filter(col("n") =!= col("bi"))
    assert(mism.count() === 0)
  }

  test("HyperplaneBuckets == per-plane sign-bit sums") {
    val tables = 3; val planes = 4; val dim = 16
    val mat = (0 until tables * planes * dim)
      .map(i => ((i * 2654435761L) % 401L) - 200L).toArray
    val vecGen = Gen.listOfN(dim, Gen.choose(-1000L, 1000L))
    val df = sample(vecGen, 200, 5L).toDF("q")
    val hof = array((0 until tables).map { t =>
      (0 until planes).map { p =>
        val plane = array((0 until dim).map(j =>
          lit(mat(((t * planes) + p) * dim + j))): _*)
        when(aggregate(zip_with(col("q"), plane, (x, w) => x * w),
          lit(0L), (a, v) => a + v) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)
    val mism = df.select(
        ArrayFunctions.hyperplaneBuckets(col("q"), mat, tables, planes, dim).as("n"),
        hof.as("bi"))
      .filter(to_json(col("n")) =!= to_json(col("bi")))
    assert(mism.count() === 0)
  }

  test("GramCensusAgg == the nested-posexplode gram + sums + count census") {
    val dim = 7 // small odd width — exercises the triangle indexing
    val tri = dim * (dim + 1) / 2
    val vecGen = Gen.listOfN(dim, Gen.choose(-700L, 700L))
    val df = sample(vecGen, 300, 8L).toDF("q")
    val buf = df.agg(ArrayFunctions.gramCensus(col("q"), dim).as("buf"))
      .head().getSeq[Long](0)
    // reference: the posexplode shape this kernel replaced
    val gram = df
      .select(col("q"), posexplode(col("q")).as(Seq("i", "vi")))
      .select(col("i"), col("vi"), posexplode(col("q")).as(Seq("j", "vj")))
      .groupBy("i", "j").agg(sum(expr("vi * vj")).as("g"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val sums = df.select(posexplode(col("q")).as(Seq("i", "vi")))
      .groupBy("i").agg(sum(col("vi")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (i <- 0 until dim; j <- i until dim) {
      val idx = i * dim - i * (i - 1) / 2 + (j - i)
      assert(buf(idx) === gram((i, j))._1, s"gram($i,$j)")
      assert(gram((i, j))._2 === 300L, s"count($i,$j)")
    }
    (0 until dim).foreach(i => assert(buf(tri + i) === sums(i), s"sum($i)"))
    assert(buf(tri + dim) === 300L)
    // strictness: ragged width and null components fail loudly
    val ragged = intercept[Exception] {
      Seq(Seq(1L, 2L)).toDF("q")
        .agg(ArrayFunctions.gramCensus(col("q"), dim)).head()
    }
    assert(ragged.getMessage != null)
    // null vector rows are skipped, empty input yields the zero buffer
    val zeros = df.select(lit(null).cast("array<bigint>").as("q"))
      .agg(ArrayFunctions.gramCensus(col("q"), dim).as("buf"))
      .head().getSeq[Long](0)
    assert(zeros.forall(_ === 0L) && zeros.size === tri + dim + 1)
  }

  test("ledger round-trips arbitrary printable file names and messages") {
    import graft.etl.{FileStatus, JsonlControlStore}
    val nameGen = wordGen.map(s => "states_" + s + ".csv")
    val names = sample(nameGen, 60, 6L).distinct
    val msgs = sample(wordGen, 60, 7L)
    val store = new JsonlControlStore(
      java.nio.file.Files.createTempDirectory("prop").resolve("l.jsonl").toString)
    store.register(names)
    names.zip(msgs).foreach { case (n, m) =>
      store.update(n, FileStatus.Failed, error = Some(m))
    }
    val all = store.all()
    names.zip(msgs).foreach { case (n, m) =>
      assert(all(n).fileName === n)
      assert(all(n).errorMessage === Some(m.take(500)))
    }
  }

  test("null array elements fail LOUDLY in every native kernel (never read as 0)") {
    // a null slot read as 0 would silently corrupt intersection counts
    // and dot products; the kernels throw instead — pin that contract
    val withNullInt = Seq((Seq[Integer](1, null, 3), Seq[Integer](0, 1, 3)))
      .toDF("a", "b")
    val e1 = intercept[Exception] {
      withNullInt.select(
        ArrayFunctions.sortedIntersectCount(col("a"), col("b"))).collect()
    }
    assert(exMessages(e1).exists(_.contains("null set element")))
    val withNullLong =
      Seq((Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L, 3L)))
        .toDF("a", "b")
    val e2 = intercept[Exception] {
      withNullLong.select(
        ArrayFunctions.dotProductLong(col("a"), col("b"))).collect()
    }
    assert(exMessages(e2).exists(_.contains("null vector component")))
    val e3 = intercept[Exception] {
      withNullLong.select(
        ArrayFunctions.sortedPackedDotLong(col("a"), col("b"))).collect()
    }
    assert(exMessages(e3).exists(_.contains("null element")))
  }

  private def exMessages(e: Throwable): List[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).toList
}
