package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WordNgramsAll

/** Corpus collocation mining: pointwise mutual information over adjacent
  * token pairs — the standard signal for phrase detection (word2vec-style
  * phrase merging, tokenizer vocabulary curation) and for spotting
  * templated text (a corpus whose top collocations are navigation
  * boilerplate has a crawl-cleaning problem).
  *
  * pmi(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p(ab)=c₂/B, p(a)=c₁/T —
  * computed as ln( (c₂·T·T) / (B·c₁ₐ·c₁ᵦ) ): every factor is an exact
  * integer-valued double and the multiplication order is mirrored
  * term-for-term in the oracle, so the value going into ln is
  * bit-identical cross-engine (products as doubles, NOT BIGINTs — c₂·T²
  * overflows 64-bit integers at large corpus sizes).
  *
  * Scale shape: bigram occurrences come from the codegen'd
  * [[WordNgramsAll]] (duplicates kept — counts are the point) → one
  * (w1,w2)-keyed aggregate; unigram counts are one term-keyed aggregate;
  * the pair relation joins the unigram relation twice ON THE TERM KEY
  * (high-cardinality, shuffle of stat rows only). T, B, and the count
  * floor are driver-side scalars from the two aggregates' tails. The
  * final top-N is an `orderBy().limit()` — Spark plans TakeOrdered, a
  * distributed per-partition top-N + driver merge, not a single-task
  * global sort. The floor scales with corpus size (B/2000, min 5) so the
  * output stays a "top collocations" report at any SF.
  */
object Collocations {

  val FloorDiv = 2000L
  val FloorMin = 5L

  def minCount(totalBigrams: Long): Long =
    math.max(FloorMin, totalBigrams / FloorDiv)

  /** Top-N collocations: (w1, w2, n_pair, pmi), ordered by
    * (n_pair desc, w1, w2) — an integer-keyed total order, so the LIMIT
    * boundary is deterministic cross-engine.
    */
  def pmiTop(docs: DataFrame, topN: Int = 100, idCol: String = "doc_id",
      textCol: String = "text", floorOverride: Option[Long] = None): DataFrame = {
    val base = graft.util.Parallelism.ensure(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // uni and pair are vocabulary-scale stat relations consumed by the
    // scalar actions below AND the final join — persist so the corpus
    // is tokenized once, not once per consumer
    val uni = graft.util.Caches.cached(
      base.select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1")))
    val pair = graft.util.Caches.cached(base
      .select(explode(WordNgramsAll.wordNgramsAll(col("text"), 2)).as("g"))
      .select(substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair")))
    def scalarOrZero(r: org.apache.spark.sql.Row): Long =
      if (r.isNullAt(0)) 0L else r.getLong(0)
    val t = scalarOrZero(uni.agg(sum("c1")).head()).toDouble
    val b = scalarOrZero(pair.agg(sum("n_pair")).head())
    val floor = floorOverride.getOrElse(minCount(b))
    val pmi = log(((col("n_pair").cast("double") * lit(t)) * lit(t)) /
      ((lit(b.toDouble) * col("c1a")) * col("c1b")))
    pair.filter(col("n_pair") >= floor)
      .join(uni.select(col("w").as("w1"), col("c1").cast("double").as("c1a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").cast("double").as("c1b")), "w2")
      .select(col("w1"), col("w2"), col("n_pair"), round(pmi, 4).as("pmi"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(topN)
  }
}
