package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting for corpus construction.
  *
  * Assignment is a pure function of the row's key hash ([[Sampling.idHash]]
  * — the same Knuth hash the samplers use), so splits are reproducible
  * across engines and reruns, stable under appends (a doc's split never
  * depends on other docs), and scan-stage only (no shuffle).
  *
  * The leakage hazard splitting ignores: near-duplicate documents landing
  * in different splits leak training data into eval.
  * [[assignSplitsLeakageSafe]] keys the hash by the doc's near-dup
  * CLUSTER id (from [[Dedup.connectedComponents]]) instead of its own id,
  * so every member of a duplicate cluster lands in the same split.
  */
object Split {

  /** Add a `split` column: key-hash ranges proportional to `weights`.
    *
    * @param weights (name, weight) pairs, weights summing to 1; split i
    *                owns hash range [cum_{i-1}, cum_i) of the hash space
    * @param keyCol  hashed key (non-negative ids; see [[Sampling.idHash]])
    */
  def assignSplits(df: DataFrame, weights: Seq[(String, Double)],
      keyCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    df.withColumn("split", splitExpr(col(keyCol), weights))
  }

  /** The split CASE expression — shared with the oracle generator so both
    * engines compare the identical thresholds.
    */
  def splitExpr(key: Column, weights: Seq[(String, Double)]): Column = {
    val h = Sampling.idHash(key)
    val conds = weights.zip(thresholds(weights))
    conds.init.foldRight(lit(conds.last._1._1): Column) {
      case (((name, _), thr), acc) => when(h < thr, lit(name)).otherwise(acc)
    }
  }

  /** Cumulative hash-space thresholds for `weights` (last = hash modulus). */
  def thresholds(weights: Seq[(String, Double)]): Seq[Long] =
    weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * Sampling.HashMod).toLong)

  /** Leakage-safe assignment: docs in the same near-dup cluster share a
    * split. `pairs` is any near-dup pair list (e.g.
    * [[Dedup.minhashNearDups]]); unclustered docs fall back to their own
    * id. Adds `split`; drops nothing.
    *
    * Scale: the cluster relation is one row per doc that HAS a near-dup
    * (typically a small fraction of the corpus); the join is keyed by doc
    * id and AQE broadcasts it when small.
    */
  def assignSplitsLeakageSafe(docs: DataFrame, pairs: DataFrame,
      weights: Seq[(String, Double)], idCol: String = "doc_id"): DataFrame = {
    val cc = Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", idCol)
    docs.join(cc, Seq(idCol), "left")
      .withColumn("split",
        splitExpr(coalesce(col("cluster"), col(idCol)), weights))
      .drop("cluster")
  }

  /** Leakage audit of a split assignment: how many near-dup pairs
    * straddle split boundaries? `(split_a, split_b, n_pairs, leaked)`
    * for every populated split combination — the validation report a
    * pipeline runs BEFORE training to quantify train→eval contamination
    * (and the measurement that motivates [[assignSplitsLeakageSafe]],
    * under which every `leaked` row must be zero).
    *
    * Scale: the pair list is the small relation (verified near-dups);
    * splits are recomputed per endpoint by the scan-stage hash CASE —
    * no join against the corpus at all, so cost ~ |pairs|, not |docs|.
    */
  def leakageReport(pairs: DataFrame, weights: Seq[(String, Double)],
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    pairs.select(
        splitExpr(col(aCol), weights).as("split_a"),
        splitExpr(col(bCol), weights).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaked", (col("split_a") =!= col("split_b")).cast("boolean"))
}
