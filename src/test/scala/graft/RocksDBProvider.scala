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
  *
  * Concurrency contract: `withFixture` mutates the provider conf on
  * the JVM-shared SparkSession (`SparkTestBase` dedupes to one session
  * via getOrCreate), which is safe ONLY because this build runs forked
  * suites sequentially (no `Test/testForkedParallel`). Enabling suite
  * parallelism would race the set/restore window — a concurrently
  * running base spec would silently start its streams under RocksDB,
  * or this twin's stream under the default provider. The post-test
  * assert below turns that silent race into a loud failure.
  */
trait RocksDBProvider extends SparkTestBase {
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  abstract override protected def withFixture(test: NoArgTest): Outcome = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try {
      val out = super.withFixture(test)
      // Guard the sequential-execution assumption: if another suite
      // flipped the shared conf mid-test, the inherited assertions just
      // ran under an unknown provider — fail here rather than pass
      // vacuously.
      assert(spark.conf.get(ProviderKey) == RocksDB,
        "state-store provider conf changed mid-test: suites are no " +
          "longer sequential; RocksDBProvider's shared-session swap " +
          "is unsound under suite parallelism")
      out
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
