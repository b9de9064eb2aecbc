package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.WordNgramsAll

/** Within-document repetition statistics (Gopher-style repetition
  * filters): how much of a document is the same token / n-gram repeated.
  * High repetition marks boilerplate and degenerate generations — a
  * standard drop rule in training-data quality pipelines, complementing
  * the cross-document dedup in [[Dedup]].
  *
  * Two signals per doc:
  *   - `token_rep`  = 1 − distinct_tokens / total_tokens — the fraction
  *     of token occurrences that are repeats;
  *   - `top_ngram_frac` = occurrences of the single most frequent n-gram
  *     / total n-gram occurrences.
  *
  * Scale shape: both are per-row array expressions over the codegen'd
  * tokenizers — token_rep directly, top_ngram_frac via explode of ALL
  * n-gram occurrences ([[WordNgramsAll]], duplicates kept — the distinct
  * shingle sets dedup uses would erase the repeat counts being measured)
  * → two-level partial aggregation keyed by (doc, ngram) then doc. Rows
  * only ever shuffle as (doc_id, ngram, cnt) triples; no doc text moves.
  * A driver-side per-doc loop or a per-doc hash map inside a UDF would
  * compute the same numbers but cap at one executor's memory per doc —
  * the two-level agg has no such cap.
  */
object Repetition {

  def tokenRepetition(text: Column): Column = {
    val ws = TextOps.tokens(text)
    when(size(ws) === 0, lit(0.0))
      .otherwise(round(lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws), 4))
  }

  /** Per-doc stats: (doc_id, n_tokens, token_rep, top_ngram_frac).
    * Zero-/sub-n-token docs stay in the output with both ratios 0.0.
    */
  def docStats(docs: DataFrame, ngram: Int = 2, idCol: String = "doc_id",
      textCol: String = "text", carryCols: Seq[String] = Nil): DataFrame = {
    // ONE scan: the per-doc scalars ride the n-gram explode as grouping
    // keys (exact per-doc values, so the key is deterministic), and
    // explode_outer keeps gram-less docs — no join back to the corpus
    // for them (or for carried report columns)
    val carry = carryCols.map(col)
    val base = graft.util.Parallelism.ensure(docs)
      .select(col(idCol).as("doc_id") +: (carry ++ Seq(
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
        tokenRepetition(col(textCol)).as("token_rep"),
        explode_outer(WordNgramsAll.wordNgramsAll(col(textCol), ngram))
          .as("g"))): _*)
    val keys = (Seq("doc_id") ++ carryCols ++ Seq("n_tokens", "token_rep"))
    base
      .groupBy((keys :+ "g").map(col): _*)
      .agg(count(col("g")).as("cnt"))
      .groupBy(keys.map(col): _*)
      .agg(max("cnt").as("top_cnt"), sum("cnt").as("total_grams"))
      .select((keys.map(col) :+
        when(col("total_grams").isNull || col("total_grams") === 0, lit(0.0))
          .otherwise(round(col("top_cnt").cast("double") / col("total_grams"), 4))
          .as("top_ngram_frac")): _*)
      .select(col("doc_id") +: (carry ++ Seq(col("n_tokens"),
        col("token_rep"), col("top_ngram_frac"))): _*)
  }

  /** Per-group repetition report: doc counts, mean ratios, and how many
    * docs a `maxTopNgramFrac` filter would drop.
    *
    * Means are accumulated as integer basis points (the 4-dp per-doc
    * ratios ×10⁴, an exact long) and divided once at the end — a double
    * `avg` would depend on partition combine order, so the 4th decimal
    * could flip between Spark partitionings and the sequential oracle
    * (same hazard [[Decontaminate.report]] documents and avoids).
    */
  def report(docs: DataFrame, groupCol: String, maxTopNgramFrac: Double,
      ngram: Int = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def bp(c: Column): Column = round(c * 10000, 0).cast("long")
    docStats(docs, ngram, idCol, textCol, carryCols = Seq(groupCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        round(sum(bp(col("token_rep"))) / (count(lit(1)) * 10000.0), 4)
          .as("avg_token_rep"),
        round(sum(bp(col("top_ngram_frac"))) / (count(lit(1)) * 10000.0), 4)
          .as("avg_top_ngram_frac"),
        sum(when(col("top_ngram_frac") > maxTopNgramFrac, 1L).otherwise(0L))
          .as("would_drop"))
      .orderBy(groupCol)
  }
}
