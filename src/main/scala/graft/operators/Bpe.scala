package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction — tokenizer TRAINING, the
  * half of the tokenizer story q82's counting only consumes (public
  * algorithm: Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units").
  *
  * Scale design (the property that makes distributed BPE cheap): merges
  * are learned from the WORD-FREQUENCY relation, not the raw corpus —
  * ONE corpus scan builds `(word, n)` and every round after that runs
  * on vocabulary-scale data. A round is: explode adjacent symbol pairs
  * weighted by word count → one (left, right) aggregate with map-side
  * partials → the argmax pair as a 1-row TakeOrdered under the
  * deterministic (count DESC, left ASC, right ASC) total order → a
  * scan-stage leftmost-greedy fold rewrites the symbol arrays. The
  * vocabulary relation is localCheckpoint'd each round (the Dedup-CC
  * pattern) so round k's plan does not replay rounds 1..k−1.
  *
  * The merge fold is a Catalyst `aggregate` higher-order expression —
  * no UDFs: leftmost-greedy, non-overlapping, matching the reference
  * algorithm's replace order ("aaa" under (a,a) → [aa, a]).
  */
object Bpe {

  /** End-of-word marker (appended to a word's last character when
    * `marker=true`), the Sennrich convention that keeps word-final
    * subwords distinct from word-internal ones.
    */
  val Eow = "</w>"

  /** `(word, n)` word-frequency relation of a corpus. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.util.Parallelism.ensure(docs)
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Initial symbol array of a word: its characters, the last one
    * suffixed with [[Eow]] when `marker` is set.
    */
  private def initialSymbols(word: Column, marker: Boolean): Column = {
    // split between characters only: not at start (Spark's limit=-1
    // split would emit a leading "") and not at end (it KEEPS trailing
    // empty strings, unlike Java's default String.split)
    val chars = split(word, "(?!^)(?!$)")
    if (!marker) chars
    else concat(slice(chars, lit(1), size(chars) - 1),
      array(concat(element_at(chars, -1), lit(Eow))))
  }

  /** Leftmost-greedy non-overlapping merge of adjacent (l, r) into the
    * concatenated symbol, as a fold over the array.
    */
  private def mergePair(syms: Column, l: String, r: String): Column = {
    def lit2(s: String) = lit(s)
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit2(l) && x === lit2(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit2(l + r))))
        .otherwise(concat(acc, array(x))))
  }

  /** Adjacent-pair weighted counts of a symbol-array vocabulary
    * relation `(word?, syms, n)`: `(left, right, n_pair)`.
    */
  private def pairCounts(vocab: DataFrame): DataFrame = vocab
    .select(col("n"), col("syms"), posexplode(slice(col("syms"), lit(1),
      greatest(size(col("syms")) - 1, lit(0)))).as(Seq("__i", "left")))
    .withColumn("right",
      element_at(col("syms"), col("__i") + 2))
    .groupBy("left", "right").agg(sum("n").as("n_pair"))

  /** First-round adjacent-pair census over the corpus — the
    * oracle-checkable stage of the learner: `(left, right, n_pair)`
    * for the top `topN` pairs under (n_pair DESC, left, right).
    */
  def firstPairCounts(docs: DataFrame, topN: Int,
      textCol: String = "text", marker: Boolean = false): DataFrame =
    pairCounts(wordCounts(docs, textCol)
      .select(col("word"), initialSymbols(col("word"), marker).as("syms"),
        col("n")))
      .orderBy(col("n_pair").desc, col("left"), col("right"))
      .limit(topN)

  /** Learn `nMerges` merges: returns `(rank, left, right, n_pair)` in
    * learning order (rank 1 = first merge). Stops early if no adjacent
    * pair remains.
    */
  def learnMerges(docs: DataFrame, nMerges: Int,
      textCol: String = "text", marker: Boolean = true): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = wordCounts(docs, textCol)
      .select(initialSymbols(col("word"), marker).as("syms"), col("n"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("n_pair").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, c))
        vocab = vocab
          .select(mergePair(col("syms"), l, r).as("syms"), col("n"))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "n_pair")
  }

  /** Segment words with a learned merge table: `(word, n, pieces)` for
    * every corpus word. The merge sequence applies in rank order as
    * nested folds INSIDE one projection — fine for the bounded merge
    * tables this trains (tens of merges); a production tokenizer would
    * compile the table into a trie/linmerge pass instead of a plan
    * expression per merge.
    */
  def segment(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", marker: Boolean = true): DataFrame = {
    val base = wordCounts(docs, textCol)
      .select(col("word"), col("n"),
        initialSymbols(col("word"), marker).as("syms"))
    val pieces = merges.foldLeft(col("syms")) { case (c, (l, r)) =>
      mergePair(c, l, r)
    }
    base.select(col("word"), col("n"), pieces.as("pieces"))
  }
}
