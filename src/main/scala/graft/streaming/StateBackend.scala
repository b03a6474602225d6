package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend wiring for the stateful streaming operators.
  *
  * The default HDFS-backed provider keeps every state key on the executor
  * heap — fine for the spec corpora, a memory wall for the production
  * shapes this package models (dropDuplicatesWithinWatermark over a day's
  * ingest, StreamNearDup's signature buckets, StreamCdcApply's per-key
  * snapshots): at 100 TB/day the state working set exceeds executor heap
  * long before the watermark expires it. RocksDB is Spark's own answer —
  * state lives in an embedded LSM store on executor-local disk with a
  * bounded block cache, checkpointed incrementally (changelog) instead of
  * full-file — and flips on purely through session conf, which is why
  * [[withRocksDb]] is a conf scope and not an operator change: every
  * operator in this package runs unmodified on either backend
  * (RocksDbStateStoreSpec pins output equality plus live RocksDB metrics
  * in the query progress). */
object StateBackend {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Incremental (changelog) checkpointing: commit the per-batch delta, not
    * a full snapshot — the production default to pair with RocksDB. */
  val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Run `body` with the session's stateful queries backed by RocksDB,
    * restoring the previous provider after. Applies to queries STARTED
    * inside the scope (the provider is resolved at query start). */
  def withRocksDb[A](s: SparkSession)(body: => A): A = {
    val prevProvider = s.conf.getOption(ProviderKey)
    val prevChangelog = s.conf.getOption(ChangelogKey)
    s.conf.set(ProviderKey, RocksDb)
    s.conf.set(ChangelogKey, "true")
    try body finally {
      prevProvider.fold(s.conf.unset(ProviderKey))(s.conf.set(ProviderKey, _))
      prevChangelog.fold(s.conf.unset(ChangelogKey))(s.conf.set(ChangelogKey, _))
    }
  }
}
