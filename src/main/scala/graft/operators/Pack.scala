package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign whole documents to consecutive
  * shards of ≈`budget` tokens each — the pretraining step that cuts a
  * corpus into context-window-sized (or file-sized) work units.
  *
  * Streaming formulation: within each group, docs are laid out in a
  * deterministic order and shard id = floor(preceding-token-count /
  * budget) — a running sum, ONE shuffle + one sort per group (the q44
  * session plan shape). Docs are kept whole, so shard sizes are budget ±
  * one document; the greedy first-fit alternative packs tighter but is
  * inherently sequential per group and offers no better bound when
  * budget >> max doc size (the pretraining regime).
  */
object Pack {

  /** Add `shard` (0-based, per `groupCol`) by running token count.
    *
    * @param tokensCol per-doc token count column
    * @param orderCol  deterministic layout order within the group
    */
  def assignShards(docs: DataFrame, budget: Long, groupCol: String,
      tokensCol: String = "n_tokens", orderCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = Window.partitionBy(groupCol).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("shard",
      floor((sum(col(tokensCol)).over(w) - col(tokensCol)) / budget))
  }
}
