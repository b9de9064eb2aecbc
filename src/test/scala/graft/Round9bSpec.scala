package graft

/** Round-9 part two: the kill-restart ≡ batch matrix on Spark's DEFAULT
  * state-store provider (HDFS-backed in-memory map). The moment-state
  * shape is covered on this axis by Round8bSpec; the full 8-shape
  * matrix runs on the RocksDB axis in Round10bRocksDbSpec.
  */
class Round9bSpec extends KillRestartBehaviors(
  axis = "default-hdfs", providerClass = None,
  includeMomentState = false)
