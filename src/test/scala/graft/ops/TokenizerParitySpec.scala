package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the SHARED tokenizer whitespace class (Det.WsClass) against the
  * one cross-engine divergence it exists to remove: Java regex `\s`
  * includes vertical tab \x0B, DuckDB/RE2's `\s` does not. Every test
  * here feeds \x0B-bearing text through a different tokenizing module
  * and asserts the PINNED semantics (\x0B is a TOKEN character, never a
  * separator) — exactly what the DuckDB oracle computes. A regression
  * to bare `\s` in any module flips these counts and fails a named
  * test, which the green sf0.01 corpus (no \x0B anywhere) cannot do.
  */
class TokenizerParitySpec extends SparkTestBase {

  import spark.implicits._

  private val VT = "\u000B" // vertical tab as escape: file stays pure text

  /** Plain-Scala reference of the pinned tokenizer. */
  private def refTokens(s: String): Seq[String] =
    s.trim.split("[ \t\n\f\r]+").toSeq.filter(_.nonEmpty)

  /** Write a documents.parquet with the harness schema into a tmp dir. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = tmpDir("toks")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("Det.words: \\x0B is a token char; the five pinned chars split") {
    val got = Seq("alpha" + VT + "beta gamma", "a\tb\nc\fd\re f")
      .toDF("text").select(Det.words(col("text")).as("w"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("alpha" + VT + "beta", "gamma"))
    assert(got(1) === Seq("a", "b", "c", "d", "e", "f"))
  }

  test("q25 doc stats counts \\x0B-joined words as one token (TextAnalysis)") {
    val text = s"the${VT}quick brown fox jumps"
    val dir = docsDir(Seq((1L, text, "en", "web")))
    val r = TextAnalysis.docStats(spark, dir)
      .select("n_tokens", "token_chars").collect()(0)
    assert(r.getLong(0) === refTokens(text).size) // 4, not Java-\s's 5
    // \x0B is NOT whitespace under the pinned class → counted as a
    // token character, matching RE2's regexp_replace in the oracle
    assert(r.getLong(1) === text.count(c => !" \t\n\f\r".contains(c)))
  }

  test("q47 repetition stats tokenizes \\x0B like the oracle (DataPrep)") {
    val text = s"one two three${VT}four five six"
    val dir = docsDir(Seq((1L, text, "en", "web")))
    val r = DataPrep.repetitionStats(spark, dir)
      .select("n_tokens").collect()(0)
    assert(r.getLong(0) === refTokens(text).size) // 5, not 6
  }

  test("q30 simhash distinguishes \\x0B-joined from space-split (Dedup)") {
    val dir = docsDir(Seq(
      (1L, s"alpha${VT}beta gamma delta epsilon zeta", "en", "web"),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "web")))
    val hs = Dedup.simhashDocs(spark, dir)
      .orderBy("doc_id").select("simhash").collect().map(_.getLong(0))
    // different token sequences → different shingle sets → different
    // simhash; under Java \s both docs would tokenize identically
    assert(hs(0) !== hs(1))
  }

  test("q82 quality rules see the pinned token count (CorpusPrep)") {
    // 10 words under Java \s, 9 under the pinned class (two are
    // \x0B-joined): the MinTokens=10 length rule fires ONLY with the
    // pinned tokenizer.
    val text = ("the of and to in is was" // 7 stopword tokens
      + s" it${VT}on x").trim // "it\x0Bon" joins → 9 pinned tokens (10 under \s)
    val dir = docsDir(Seq((1L, text, "en", "web")))
    val r = CorpusPrep.qualityRules(spark, dir)
      .select("v_len").collect()(0)
    assert(refTokens(text).size === 10 - 1)
    assert(r.getLong(0) === 1L)
  }
}
