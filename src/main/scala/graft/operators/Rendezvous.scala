package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard assignment: doc d lands on
  * `argmax over shards s of h(d, s)` — the consistent-hashing scheme
  * whose defining property is MINIMAL MOVEMENT: growing S shards to S+1
  * relocates exactly the docs whose new-shard weight wins (≈ 1/(S+1) of
  * the corpus, spec-pinned) and NEVER moves a doc between two old
  * shards. Mod-ring sharding (`hash(d) % S` — [[Export]]'s scheme)
  * reshuffles ~everything on any S change; rendezvous is what a
  * continuously-reprocessed corpus uses so downstream caches and
  * per-shard state survive resizes.
  *
  * Deterministic and oracle-mirrorable: the id is scrambled ONCE
  * (`x = (d·p₁ + 11) mod M`, so the multiplicand is uniform over the
  * ring, not a small raw id) and each shard applies its own multiplier
  * (`h = x · ((p₁ + s·p₂) mod M) mod M`). Both halves matter: an
  * additive-only shard term makes the largest s win ~always, and an
  * unscrambled small id never wraps the modulus, so the largest
  * multiplier wins — both degeneracies were measured, and the spec
  * pins balance AND the movement law. Ties break to the smallest
  * shard id. The argmax is a SCAN-STAGE array fold (transform →
  * array_max over (h, -s) structs) — no explode, no join, no shuffle;
  * S weights per row evaluated inside codegen.
  */
object Rendezvous {

  private val M = Sampling.HashMod
  private val P1 = 2654435761L
  private val P2 = 97003L

  /** Weight of (id, shard) — public for the spec's closed-form check. */
  def weight(id: Long, shard: Int): Long =
    ((id % M) * P1 + 11) % M * ((P1 + shard * P2) % M) % M

  private def weightCol(id: Column, s: Column): Column =
    ((id % lit(M)) * lit(P1) + 11) % lit(M) *
      ((lit(P1) + s * lit(P2)) % lit(M)) % lit(M)

  /** Adds an integer `shard` column (0-based). */
  def assignShards(df: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val packed = transform(sequence(lit(0), lit(nShards - 1)),
      s => struct(weightCol(col(idCol), s).as("h"), (-s).as("ns"),
        s.as("s")))
    // array_max compares structs lexicographically: max h, then max -s
    // (= smallest shard id) — the deterministic rendezvous winner
    df.withColumn("shard", array_max(packed).getField("s"))
  }

  /** Per-shard census: `(shard, n_docs, min_id, max_id)`. */
  def shardReport(df: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame =
    assignShards(df, nShards, idCol)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
      .orderBy("shard")
}
