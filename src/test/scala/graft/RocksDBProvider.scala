package graft

import org.scalatest.Outcome

/** Mixin that re-runs an entire streaming spec with the RocksDB state
  * store provider. The provider is a per-query conf read at stream
  * START, so setting the session conf around each test flips every
  * stream the test starts — the exact one-setting swap a production
  * deployment makes. Mix into an existing spec class to create its
  * RocksDB twin (see `RocksDBAllStatefulSpec`): the inherited tests
  * assert identical semantics, so any RocksDB-vs-default divergence
  * (typed state encoders, point-read recovery, snapshot+changelog
  * restart) fails loudly instead of surfacing in production.
  */
trait RocksDBProvider extends SparkTestBase {
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  abstract override protected def withFixture(test: NoArgTest): Outcome = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try super.withFixture(test)
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
