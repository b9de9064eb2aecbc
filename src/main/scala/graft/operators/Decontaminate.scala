package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora.
  *
  * Extends the reference's profile-and-emit pattern
  * (`/root/reference/DataFrames/databand_tracking_template.py:21-31`) with
  * the standard pre-training hygiene step: measure, per corpus document,
  * what fraction of its n-gram shingles also occur anywhere in a held-out
  * benchmark/eval set, and flag documents above a threshold as
  * contaminated (to be dropped before training).
  *
  * Scale shape (the 100 TB case is a ~100 TB corpus vs a benchmark of at
  * most a few million shingles — eval sets are small by construction):
  *   - the benchmark side collapses to DISTINCT shingles once and is
  *     broadcast — corpus rows never shuffle for the membership test;
  *   - the corpus side explodes its (per-doc distinct) shingles in the
  *     scan stage, left-joins the broadcast set, and immediately
  *     re-aggregates to one row per doc (partial agg map-side), so the
  *     only shuffle is keyed by doc_id and carries two longs per doc;
  *   - zero-shingle docs (shorter than the n-gram) re-enter via a left
  *     join from the corpus spine with overlap 0.0 — they cannot be
  *     contaminated but must stay in the report.
  *
  * If the "benchmark" were ever corpus-sized, drop the broadcast hint and
  * the same plan degrades gracefully to a shuffle hash join — the hint is
  * the only line that encodes the size asymmetry.
  */
object Decontaminate {

  /** Per-document overlap scores: (doc_id, n_shingles, n_hits, overlap).
    * `overlap` = |doc shingles ∩ benchmark shingles| / |doc shingles|,
    * i.e. containment of the doc in the benchmark vocabulary — the
    * direction that catches verbatim benchmark quotes inside long docs
    * (symmetric Jaccard would dilute them).
    */
  def overlapScores(corpus: DataFrame, benchmark: DataFrame, ngram: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame = {
    val benchShingles = graft.util.Parallelism.ensure(benchmark)
      .select(explode(TextOps.ngrams(col(textCol), ngram)).as("sh"))
      .distinct()
      .withColumn("hit", lit(1L))
    // ONE corpus scan: explode_outer keeps shingle-less docs (a null
    // shingle matches no benchmark row), so no join back to the corpus
    // for them or for carried report columns
    val carry = carryCols.map(col)
    graft.util.Parallelism.ensure(corpus)
      .select(col(idCol).as("doc_id") +: (carry :+
        explode_outer(TextOps.ngrams(col(textCol), ngram)).as("sh")): _*)
      .join(broadcast(benchShingles), Seq("sh"), "left")
      .groupBy((Seq("doc_id") ++ carryCols).map(col): _*)
      .agg(count(col("sh")).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("doc_id") +: (carry ++ Seq(
        col("n_shingles"), col("n_hits"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_hits").cast("double") / col("n_shingles"), 4))
          .as("overlap"))): _*)
  }

  /** Per-group contamination report over a corpus/benchmark split:
    * (group, n_docs, contaminated_docs, avg_overlap).
    *
    * Overlap is accumulated as integer basis points (round(hits·10⁴/n))
    * rather than averaging per-doc doubles: a long sum is
    * order-independent, so the result is bit-identical no matter how
    * partitions combine — averaging doubles directly flips the 4th
    * decimal between engines/run layouts when the sum lands on a
    * rounding boundary.
    */
  def report(corpus: DataFrame, benchmark: DataFrame, groupCol: String,
      threshold: Double, ngram: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bp = when(col("n_shingles") === 0, lit(0L))
      .otherwise(round(col("n_hits") * 10000.0 / col("n_shingles"), 0).cast("long"))
    overlapScores(corpus, benchmark, ngram, idCol, textCol,
      carryCols = Seq(groupCol))
      .withColumn("bp", bp)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bp") >= (threshold * 10000).toLong, 1L).otherwise(0L))
          .as("contaminated_docs"),
        round(sum("bp") / (count(lit(1)) * 10000.0), 4).as("avg_overlap"))
      .orderBy(groupCol)
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * shingle overlap above (catches paraphrased eval leakage that shares
    * no n-grams): a corpus vector is contaminated when its cosine
    * similarity to ANY eval-set vector reaches `threshold`.
    *
    * Same size asymmetry, same plan: the eval set broadcasts, the corpus
    * scans ONCE through a broadcast nested-loop left join whose
    * condition is the cosine predicate (O(|eval|) codegen'd [[
    * graft.functions.ArrayDot]] products per corpus row, no shuffle of
    * vectors), then a doc-keyed max collapses multi-eval matches and the
    * label rollup aggregates three longs. Per-label report:
    * (label, n_total, n_contaminated, n_kept).
    */
  def semanticReport(corpus: DataFrame, evalSet: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    import Similarity.{dot, norm}
    val c = graft.util.Parallelism.ensure(corpus)
      .select(col(idCol).as("vec_id"), col(labelCol).as("label"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nv", norm(col("v")))
    val e = evalSet
      .select(col(vecCol).cast("array<double>").as("ev"))
      .withColumn("nev", norm(col("ev")))
    // threshold compares the 4-dp-ROUNDED cosine (the repo convention —
    // see Similarity.nearDupPairs): the oracle's cut is then identical
    // even where the two engines' cosines differ in the last ulps
    c.join(broadcast(e),
        round(dot(col("v"), col("ev")) / (col("nv") * col("nev")), 4) >= threshold,
        "left")
      .select(col("vec_id"), col("label"),
        when(col("ev").isNotNull, 1L).otherwise(0L).as("hit"))
      .groupBy("vec_id", "label").agg(max("hit").as("contam"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_total"),
        sum("contam").as("n_contaminated"),
        (count(lit(1)) - sum("contam")).as("n_kept"))
      .orderBy("label")
  }
}
