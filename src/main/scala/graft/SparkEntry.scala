package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented
  * operator from SURVEY.md §2 + the extended training-data ops);
  * `oracleSql` holds a DuckDB-equivalent ANSI SQL statement for every
  * SQL-expressible query, with identical column names/aliases so the
  * driver's sorted-column hash compare matches cell-for-cell.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q03RevenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.FlightQueries.queries ++
      ops.TextAnalysis.queries ++ ops.Dedup.queries ++
      ops.Similarity.queries ++ ops.MultiModal.queries ++
      ops.Sketches.queries ++ ops.RangeJoin.queries ++
      ops.DataPrep.queries ++ ops.Funnels.queries ++ ops.Quality.queries ++
      ops.Graphs.queries ++ ops.Search.queries ++ ops.HeavyHitters.queries ++
      ops.Mixing.queries ++ ops.Scd.queries ++ ops.Reshape.queries ++
      ops.CorpusPrep.queries ++ ops.Pruning.queries ++
      ops.ScaleJoins.queries ++ ops.Profiling.queries ++
      ops.Temporal.queries

  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.FlightQueries.oracles ++
      ops.TextAnalysis.oracles ++ ops.Dedup.oracles ++
      ops.Similarity.oracles ++ ops.MultiModal.oracles ++
      ops.Sketches.oracles ++ ops.RangeJoin.oracles ++
      ops.DataPrep.oracles ++ ops.Funnels.oracles ++ ops.Quality.oracles ++
      ops.Graphs.oracles ++ ops.Search.oracles ++ ops.HeavyHitters.oracles ++
      ops.Mixing.oracles ++ ops.Scd.oracles ++ ops.Reshape.oracles ++
      ops.CorpusPrep.oracles ++ ops.Pruning.oracles ++
      ops.ScaleJoins.oracles ++ ops.Profiling.oracles ++
      ops.Temporal.oracles
}
