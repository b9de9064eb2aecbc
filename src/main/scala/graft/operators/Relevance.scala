package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

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

  /** RAKE keyword extraction (public method: Rose, Engel, Cramer &
    * Cowley 2010's Rapid Automatic Keyword Extraction): candidate
    * phrases are MAXIMAL runs of non-stopword tokens; each word scores
    * degree/frequency (degree = Σ length of phrases containing it —
    * words keeping long-phrase company rank up), and a phrase scores
    * the sum of its words — multi-word domain terms beat lone frequent
    * words, which is the single thing tf-idf's unigram view misses.
    *
    * Shape: one token scan; runs come from the gaps-and-islands trick
    * (`pos − row_number` per doc over non-stop tokens — a doc-grain
    * window); word stats are vocabulary-grain; the phrase census and
    * the per-word micro scores `(deg·10⁶) div freq` are exact
    * integers, so phrase scores sum order-free and the top-k is a
    * TakeOrdered under (score desc, phrase asc).
    *
    * Output: (phrase, n_words, n_occurrences, score_micro), top `k`.
    */
  def rakeKeywords(docs: DataFrame, k: Int,
      stopwords: Seq[String] = TextOps.Stopwords,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, "k")
    import org.apache.spark.sql.expressions.Window
    val toks = graft.util.Parallelism.ensure(docs)
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(!col("w").isin(stopwords.map(x => x: Any): _*))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val phrases = graft.util.Caches.cached(toks
      .withColumn("island", col("pos") - row_number().over(byDoc))
      .groupBy("doc_id", "island")
      .agg(count(lit(1)).as("n_words"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          s => s.getField("w")), " ").as("phrase"))
      .select("phrase", "n_words"))
    val words = phrases
      .select(col("n_words"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("n_words").as("deg"))
      .withColumn("score_w", expr("(deg * 1000000) div freq"))
    val census = phrases.groupBy("phrase", "n_words")
      .agg(count(lit(1)).as("n_occurrences"))
    census
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(words.select("w", "score_w"), Seq("w"))
      .groupBy("phrase", "n_words", "n_occurrences")
      .agg(sum("score_w").as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase").asc)
      .limit(k)
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("block").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("block", "term", "score", "rank")
  }

  /** DATA-SELECTION importance weights (public method: DSIR — Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling", reduced to its unigram form): score every document
    * by how much more likely its tokens are under the TARGET slice's
    * unigram distribution than under the whole corpus's,
    *
    *   logw(d) = Σ_w tf_w(d) · [ln p̂_target(w) − ln p̂_source(w)],
    *
    * with add-one smoothing over the corpus vocabulary on both sides.
    * High-logw documents "look like" the target slice — the ranking a
    * curation pass resamples from.
    *
    * Exactness: each ln factors into ln(count+1) − ln(total+V) with
    * every ln taken of an INTEGER-valued double and nano-rounded (the
    * heapsFit/zipfFit convention), so per-word λ_w and per-doc sums
    * are exact integers; the two corpus-level terms ride a broadcast
    * 1-row stat relation. Shape: one token explode, a word-grain
    * census join (vocabulary grain, never doc×vocab), per-doc sum,
    * top-k by (logw desc, doc_id) — a TakeOrdered, no corpus sort.
    *
    * Output top-k rows: (doc_id, n_tokens, logw_nano, rank).
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
      k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def lnNano(e: Column) =
      round(log(e.cast("double")) * lit(1e9)).cast("long")
    val tf = graft.util.Caches.cached(
      graft.util.Parallelism.ensure(docs)
        .select(col(idCol).as("id"), targetPred.as("tgt"),
          explode(TextOps.tokens(col(textCol))).as("w"))
        .groupBy("id", "tgt", "w").agg(count(lit(1)).as("tf")))
    val wordCensus = tf.groupBy("w")
      .agg(sum("tf").as("cs"),
        sum(when(col("tgt"), col("tf")).otherwise(0L)).as("ct"))
    val totals = wordCensus.agg(
      sum("cs").as("n_src"), sum("ct").as("n_tgt"),
      count(lit(1)).as("vocab"))
    val lambda = wordCensus.crossJoin(broadcast(totals))
      .select(col("w"),
        (lnNano(col("ct") + 1) - lnNano(col("n_tgt") + col("vocab")) -
          lnNano(col("cs") + 1) +
          lnNano(col("n_src") + col("vocab"))).as("lam_nano"))
    val scored = tf.join(lambda, Seq("w"))
      .groupBy("id")
      .agg(sum("tf").as("n_tokens"),
        sum(expr("cast(tf as decimal(38,0)) * lam_nano"))
          .cast("long").as("logw_nano"))
    // top-k via orderBy+limit — TakeOrderedAndProject does a
    // DISTRIBUTED partial top-k per partition and merges k-row heaps
    // on the driver; the previous unpartitioned row_number window
    // funneled every scored document through one task. TakeOrdered
    // returns the k rows already in (logw desc, id asc) order —
    // guaranteed sorted output, the order rank is defined over — so
    // rank is just the position in the collected k-row stat relation.
    val top = scored.orderBy(col("logw_nano").desc, col("id").asc)
      .limit(k)
    val rows = graft.util.Guards.countedCollect(
      top, "Relevance.importanceWeights", k.toLong)
    val ranked = rows.zipWithIndex.map { case (r, i) =>
      Row(r.get(0), r.get(1), r.get(2), i + 1)
    }
    val spark = docs.sparkSession
    spark.createDataFrame(
        spark.sparkContext.parallelize(ranked.toSeq, 1),
        StructType(top.schema.fields :+
          StructField("rank", IntegerType, nullable = false)))
      .select(col("id").as(idCol), col("n_tokens"),
        col("logw_nano"), col("rank"))
  }
}
