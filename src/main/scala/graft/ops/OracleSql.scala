package graft.ops

/** Shared fragment builders for the DuckDB oracle SQL strings.
  *
  * The driver's correctness hash is TYPE-sensitive: in DuckDB,
  * `sum(BIGINT)` returns HUGEINT and integer division (`//`)
  * propagates it, while the Spark side of every ppm-style column is
  * BIGINT (LongType). Round 8 shipped five hand-rolled
  * `… * 1000000 // …` oracle columns without the closing
  * `CAST(… AS BIGINT)` and all five hash-failed with cell-exact
  * values. Every ppm fragment now goes through [[ppmSql]] so new
  * oracles inherit the cast by construction; `tools/check_oracle.py`
  * additionally DESCRIBE-compares DuckDB logical types per column and
  * hard-fails any oracle emitting HUGEINT.
  */
object OracleSql {

  /** Parts-per-million ratio, always BIGINT on the oracle side:
    * `CAST(num * 1000000 // den AS BIGINT)`. Matches the Spark-side
    * convention (integer ppm columns are LongType throughout). */
  def ppmSql(num: String, den: String): String =
    s"CAST($num * 1000000 // $den AS BIGINT)"
}
