package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Flesch reading-ease per document — the classic readability quality
    * filter (C4's terminal-punctuation rule's quantitative cousin):
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`.
    *
    * Sandbox-honest approximations, identical in the SQL oracle:
    * syllables = vowel-group runs (`[aeiouy]+`) over the lowercased
    * text (runs cannot span whitespace, so per-word and global counts
    * agree; zero-vowel tokens contribute 0 rather than the classic
    * min-1 — documented deviation, keeps the count one regexp);
    * sentences = terminal-punctuation runs (`[.!?]+`) floored at 1 so
    * unpunctuated text reads as one long sentence instead of dividing
    * by zero. All three counts are exact integers; the score is the
    * one double, 4 dp. Pure scan-stage — no shuffle, no join.
    */
  def readability(docs: DataFrame, idCol: String = "doc_id",
      carryCols: Seq[String] = Seq("source"),
      textCol: String = "text"): DataFrame = {
    val nWords = size(TextOps.tokens(col(textCol))).cast("long")
    val nSyl = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val nSentRaw = size(regexp_extract_all(col(textCol),
      lit("[.!?]+"), lit(0))).cast("long")
    docs.select(
        col(idCol) +: carryCols.map(col) :+
          nWords.as("n_words") :+
          greatest(lit(1L), nSentRaw).as("n_sentences") :+
          nSyl.as("n_syllables"): _*)
      .withColumn("flesch",
        when(col("n_words") > 0, round(
          lit(206.835) -
            lit(1.015) * (col("n_words") / col("n_sentences")) -
            lit(84.6) * (col("n_syllables") / col("n_words")), 4)))
      .orderBy(idCol)
  }
}
