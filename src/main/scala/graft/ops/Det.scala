package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for the DuckDB-oracle differential harness.
  *
  * The harness hash-compares cell values, so floating-point results must
  * be BIT-EXACT across engines. Sums of doubles are order-dependent
  * (Spark's partial aggregation reorders additions), so we never hash a
  * raw double sum. Instead:
  *
  *   - money columns are scaled to integer cents PER ROW
  *     (`round(x*100)` → an integral double); sums of integral doubles
  *     ≤ 2^53 are exact and order-independent, then cast to BIGINT.
  *   - composite measures (price·(1−disc)·(1+tax)) are scaled by a
  *     power of ten large enough to keep all precision, rounded per
  *     row the same way. Both engines evaluate the identical
  *     left-associated IEEE-double expression, so the pre-round value
  *     is bit-identical and the rounded integer is too.
  *   - averages/ratios are emitted as exact-integer numerator and
  *     denominator, or as a division of two already-exact values
  *     (identical operands ⇒ identical IEEE result in both engines).
  *
  * This is not a test-only trick: at 100 TB, fixed-point integer
  * aggregation is also the *fast* path (long sums, no decimal overhead).
  */
object Det {
  /** Whitespace characters of the PINNED tokenizer class, for embedding
    * inside a larger character class (e.g. `s"[a-z0-9$WsChars]"`).
    * Why pinned: Java regex `\s` includes vertical tab \x0B while
    * DuckDB's RE2 `\s` does not, so any tokenizer that writes `\s` on
    * the Spark side and `\s` in the oracle SQL silently diverges on
    * \x0B-bearing text. The explicit 5-char ASCII set means NEITHER
    * engine's `\s` semantics are load-bearing. The value is the same
    * source text in both dialects: each `\t`/`\n`/`\f`/`\r` is a
    * 2-char backslash escape interpreted identically by java.util.regex
    * and RE2 (SQL string literals don't process backslashes, so the
    * escape reaches RE2 intact). */
  val WsChars: String = " \\t\\n\\f\\r"

  /** The pinned whitespace class `[ \t\n\f\r]` — use this (never `\s`)
    * in every tokenizer regex AND every oracle CTE. */
  val WsClass: String = "[" + WsChars + "]"

  /** THE tokenizer: split on runs of pinned whitespace after trim.
    * Every module that counts/explodes tokens must use this (or embed
    * [[WsClass]]) so Spark and the DuckDB oracle tokenize identically.
    *
    * Known, PINNED quirk: `trim` strips only ASCII spaces (identically
    * in Spark and DuckDB), so text bounded by `\t`/`\n`/`\f`/`\r`
    * yields a phantom empty first/last token ("\tfoo bar" → ["", foo,
    * bar], count 3). Both engines agree cell-for-cell — 185 oracles
    * hash against exactly these semantics — so this is the tokenizer's
    * CONTRACT, not a bug to fix: changing it means changing
    * [[wordsSql]] and re-verifying every text-family oracle in the
    * same commit. */
  def words(c: Column): Column = split(trim(c), WsClass + "+")

  /** [[words]] as a DuckDB SQL fragment over an expression string. */
  def wordsSql(e: String): String =
    s"string_split_regex(trim($e), '$WsClass+')"

  /** THE cross-engine 32-bit hash: first 8 hex digits of md5 as a
    * BIGINT. One definition for every module that buckets, splits,
    * samples or fingerprints by hash — a drift in any per-module copy
    * would silently desynchronize the engines' bucket assignment. */
  def h8(c: Column): Column = graft.functions.ArrayFunctions.md5Prefix(c, 8)

  /** [[h8]] as a DuckDB SQL fragment over an expression string. */
  def h8Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  /** Per-row money→integer-cents; sum(cents(x)) is exact + order-free. */
  def cents(c: Column): Column = round(c * lit(100))

  /** Per-row scale by 10^e then round to integral double. */
  def fixed(c: Column, e: Int): Column = round(c * lit(math.pow(10, e)))

  /** Exact BIGINT sum of a per-row integral-double measure. */
  def lsum(c: Column): Column = sum(c).cast("long")
}
