package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality model — the sandbox-honest stand-in for
  * classifier-based quality filtering (the fastText / logistic-regression
  * stage of a training-data pipeline: CCNet, GPT-3's WebText classifier).
  *
  * A real deployment loads a trained weight vector; this container has no
  * model artifacts, so the weights are a DETERMINISTIC pseudo-weight
  * table derived from the feature index (Knuth multiplicative hash →
  * integer in [-1000, 1000], scaled by 1e-3). The Spark-side plumbing is
  * the real thing: tokens hash into `dim` buckets (the hashing trick),
  * the doc score is the mean bucket weight, and everything runs in the
  * scan stage — no shuffle, no UDF, no model broadcast needed until real
  * weights replace [[weightInt]].
  *
  * All arithmetic before the final division is integer (hash, mod,
  * Knuth multiply), so the DuckDB oracle reproduces scores bit-exactly.
  */
object QualityModel {

  /** Feature hashing dimension (buckets). */
  val Dim = 4096L

  /** Knuth multiplier, shared with [[Sampling.idHash]]'s family. */
  val Knuth = 2654435761L
  val WMod = 1000003L

  /** Integer pseudo-weight of feature `f` in [-1000, 1000]. */
  def weightInt(f: Column): Column =
    ((f * Knuth) % WMod) % 2001L - 1000L

  /** Integer-basis-point doc score: round(Σ weight · 10 / n_tokens) —
    * mean bucket weight in tenths of a basis point, 0 for empty docs.
    * Integer until the one rounded division, so the oracle reproduces
    * it bit-exactly; divide by 10000.0 for the [-1, 1] score.
    */
  def scoreBp(text: Column, dim: Long = Dim): Column = {
    val ws = TextOps.tokens(text)
    val feats = transform(ws, w => TextOps.rollingHash(w) % dim)
    val total = aggregate(feats, lit(0L), (acc, f) => acc + weightInt(f))
    when(size(ws) === 0, lit(0L))
      .otherwise(round(total * lit(10.0) / size(ws)).cast("long"))
  }

  /** Mean hashed-bucket weight over the doc's tokens, in [-1, 1]. */
  def score(text: Column, dim: Long = Dim): Column =
    scoreBp(text, dim).cast("double") / 10000.0
}
