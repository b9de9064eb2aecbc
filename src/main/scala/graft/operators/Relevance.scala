package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: TF-IDF over the tokenized documents table —
  * the classic signal a training-data pipeline uses for topic/keyword
  * profiling and boilerplate detection (a term that scores high
  * everywhere is boilerplate; one that scores high in one slice is
  * topical).
  *
  * Scale shape: tokens explode once; term frequency is a grouped count
  * (map-side partial agg collapses each partition's repeats before the
  * shuffle); document frequency reuses the same relation; the join of
  * (doc, term, tf) with (term, df) shuffles by term — the natural key.
  * Corpus size N is a driver-side scalar (one count), never a join.
  */
object Relevance {

  /** (doc_id, block, term, tf, df, tfidf) — per-document term scores.
    * tfidf = tf · ln(N / df), the raw-count formulation (deterministic,
    * no per-doc length division).
    */
  def tfidf(docs: DataFrame, blockCol: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val n = docs.count()
    val tok = graft.util.Parallelism.ensure(docs)
      .select(col(idCol).as("doc_id"), col(blockCol).as("block"),
        explode(TextOps.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("doc_id", "block", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df")) // one row per (doc, term) → count = doc frequency
    tf.join(dfreq, "term")
      .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
  }

  /** Top-k terms per block by summed TF-IDF — the per-slice keyword
    * profile. Rounded before ranking so the oracle's cut is identical.
    *
    * The ranking window partitions on `block` (low cardinality), but its
    * input is the per-block VOCABULARY relation (one stat row per
    * distinct term, produced by the aggregate above) — bounded by
    * vocabulary size, not corpus size, so the per-block sort stays small
    * at any corpus scale. (An aggregate top-k would need a total order
    * including the string tiebreak, which TopKBy's descending struct
    * order can't express for ascending strings.)
    */
  def topTerms(docs: DataFrame, blockCol: String, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = tfidf(docs, blockCol, idCol, textCol)
      .groupBy("block", "term")
      .agg(round(sum("tfidf"), 4).as("score"))
    val w = Window.partitionBy("block").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("block", "term", "score", "rank")
  }
}
