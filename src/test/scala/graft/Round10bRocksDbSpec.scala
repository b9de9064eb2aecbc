package graft

/** Round-10 part two: ALL 8 stateful kill-restart shapes on the
  * ROCKSDB state-store provider — the config a 100 TB streaming
  * deployment actually runs, where keyed state outgrows executor heap
  * and lives in a RocksDB instance per state partition with its own
  * checkpoint/changelog/recovery path. Green here means the durability
  * story is provider-portable, not an artifact of the default
  * in-memory store's snapshot format.
  */
class Round10bRocksDbSpec extends KillRestartBehaviors(
  axis = "rocksdb",
  providerClass = Some("org.apache.spark.sql.execution.streaming" +
    ".state.RocksDBStateStoreProvider"),
  includeMomentState = true)
