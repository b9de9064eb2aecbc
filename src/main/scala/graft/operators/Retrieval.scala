package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the documents table: BM25 scoring and
  * lexical+vector hybrid ranking — the query side of a RAG/eval
  * pipeline, and the relevance filter a targeted-corpus build runs
  * against a large crawl ("keep pages matching these topics").
  *
  * Scale shape (BM25): ONE token explode feeds both the (doc, term, tf)
  * aggregate and the (term, df) vocabulary aggregate — the only two
  * corpus-sized shuffles, both of stat rows (strings + longs, never
  * text). Document length rides the tf grouping key (it is functionally
  * dependent on doc_id, so adding it to the key is free) — no separate
  * doc-length join. The query set joins in twice as a BROADCAST: first
  * restricting the vocabulary relation to query terms (vocab scan →
  * ≤|query terms| rows), then restricting tf to candidate docs; nothing
  * downstream of the broadcast join touches non-matching docs. Per-term
  * scores are rounded to integer MICRO-points before the per-(query,doc)
  * sum, so the sum is order-independent and the DuckDB oracle comparison
  * is exact. Final top-k is the [[graft.functions.TopKBy]] aggregate —
  * partial aggregation ships ≤k rows per query per partition, no
  * per-query sort of the full candidate set.
  */
object Retrieval {

  /** BM25 constants (the Robertson/Sparck-Jones defaults). Written as
    * plain literals in BOTH engines — never derived arithmetic like
    * `k1 + 1` — so the IEEE doubles agree bit-for-bit.
    */
  val K1 = 1.2
  val B = 0.75

  /** Per-(query, doc) BM25 scores in integer micro-points.
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1) (the always-positive
    * Lucene form); per-term contribution
    * idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), rounded to ×1e6
    * before summing. N and avgdl are driver-side stat scalars (one tiny
    * aggregate over the scan-stage doc-length projection).
    */
  def bm25Scores(docs: DataFrame, queries: Seq[(Int, Seq[String])],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = graft.util.Parallelism.ensure(docs)
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("ws"))
    // N and avgdl from ONE aggregate over the scan-stage length projection
    val st = base.select(size(col("ws")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum("dl").as("t")).head()
    val n = st.getLong(0)
    // empty/token-less corpus: sum is NULL; any avgdl works — every
    // downstream relation is empty, this just keeps the plan finite
    val avgdl =
      if (n == 0L || st.isNullAt(1)) 1.0 else st.getLong(1).toDouble / n.toDouble
    // tf feeds BOTH the vocabulary aggregate and the candidate join —
    // persist so the corpus is tokenized once, not per consumer (the
    // (doc, term, tf) stat relation spills gracefully at scale)
    val tf = graft.util.Caches.cached(base
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qdf = queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    // vocabulary → query terms only (tiny), then broadcast into tf
    val qterms = dfreq.join(broadcast(qdf), "term")
    val idf = log(((lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) + lit(1.0))
    val w = idf * ((col("tf") * lit(2.2)) /
      (col("tf") + lit(K1) * (lit(0.25) + lit(B) * col("dl") / lit(avgdl))))
    tf.join(broadcast(qterms), "term")
      .select(col("query_id"), col("doc_id"),
        round(w * lit(1000000.0)).cast("long").as("s"))
      .groupBy("query_id", "doc_id")
      .agg(sum("s").as("score_micro"))
  }

  /** Top-k docs per query by BM25: (query_id, rank, doc_id, score_micro),
    * rank 1-based over (score desc, doc_id asc).
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, Seq[String])], k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25Scores(docs, queries, idCol, textCol)
      .groupBy("query_id")
      .agg(graft.functions.TopKBy.topKBy(
        struct(col("score_micro"), (-col("doc_id")).as("nd")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        (-col("t.nd")).as("doc_id"), col("t.score_micro").as("score_micro"))

  /** Hybrid lexical+vector retrieval via reciprocal-rank fusion:
    * rrf = Σ 1/(60 + rank) over the BM25 ranking and the brute-force
    * cosine ranking (doc ids and vector ids share an id space). Each
    * ranker contributes its top-`pool`; fusion is a full-outer join of
    * two ≤pool-row-per-query relations, so the ranking window's input is
    * bounded by 2·pool rows per query — NOT a corpus-sized window.
    * 1/(60+rank) is an exact IEEE division of small integers and the
    * two-term sum has a fixed operand order, so rrf is bit-identical
    * cross-engine and safe to rank on unrounded.
    */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
      specs: Seq[(Int, Seq[String], Long)], k: Int, pool: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = bm25TopK(docs, specs.map(s => (s._1, s._2)), pool, idCol, textCol)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val probes = specs.map { case (qid, _, pid) => (qid, pid) }
      .toDF("query_id", "probe_id")
    val vec = Similarity.bruteForceTopK(embeddings, specs.map(_._3), pool)
      .select(col("query_id").as("probe_id"), col("vec_id").as("doc_id"),
        col("rank").as("vec_rank"))
      .join(broadcast(probes), "probe_id").drop("probe_id")
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)))
    val win = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(win).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("rrf"), 6).as("rrf"), col("lex_rank"), col("vec_rank"))
  }
}
