package graft.etl

import org.apache.spark.sql.DataFrame

/** Reference-faithful JDBC data-plane sinks (K2/K3 variants).
  *
  * The reference appends every raw chunk to Postgres
  * `db_staging.raw_flight_states` (`load_warehouse.py:151`, via
  * `pandas.to_sql(if_exists='append')`). The default pipeline here
  * stages to parquet — the right call at 100 TB, where a single-writer
  * RDBMS is the bottleneck — but the JDBC path stays available for
  * users pointed at a real warehouse, expressed through Spark's own
  * JDBC writer so the append is distributed (one connection per
  * partition, `batchsize` rows per round trip).
  *
  * Insert-only appends are exactly what `df.write.jdbc` CAN express;
  * everything needing upsert/RETURNING lives in the driver-side
  * control stores ([[JdbcControlStore]], [[graft.extract.JdbcJobControl]]).
  */
object JdbcSinks {

  /** K2: distributed append of a (raw or clean) frame to a JDBC table.
    * `numPartitions` caps concurrent connections — size it to what the
    * target database tolerates, not to the cluster's core count. */
  def appendTable(df: DataFrame, url: String, table: String,
      props: java.util.Properties, numPartitions: Int = 8,
      batchSize: Int = 10000): Unit = {
    // coalesce never INCREASES partition count, so the bound applies
    // unconditionally — the previous df.rdd.getNumPartitions guard
    // built a whole separate deserializing plan to read a number the
    // call cannot change
    df.coalesce(numPartitions).write
      .mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
  }
}
