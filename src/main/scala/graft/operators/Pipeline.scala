package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The canonical training-data preparation pipeline, composed from the
  * individual operators: normalize → quality-filter → exact-dedup →
  * survivor corpus. One declarative plan end to end — Catalyst sees all
  * four stages at once, so normalization fuses into the scan, the
  * quality filter prunes rows BEFORE the dedup shuffle, and only
  * (fingerprint, doc_id) pairs ever move between executors.
  */
object Pipeline {

  /** Cleaned, quality-filtered, exact-deduplicated corpus. Returns the
    * surviving docs with `norm_text` and `quality` columns attached.
    * Survivor per fingerprint group = min doc_id (deterministic).
    */
  def prepareCorpus(docs: DataFrame, minQuality: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cleaned = graft.util.Parallelism.ensure(docs)
      .withColumn("norm_text", TextOps.normalize(col(textCol)))
      .withColumn("quality", TextOps.qualityScore(col("norm_text")))
      .filter(col("quality") >= minQuality)
    val w = Window.partitionBy(TextOps.fingerprint(col("norm_text")))
      .orderBy(col(idCol).asc)
    cleaned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** One incremental-ingest step, the maintained-state form the q67/q74
    * operators assume: dedup a delivery against the corpus's fingerprint
    * STORE (never the corpus itself), and return both the surviving docs
    * and the store to hand to the next delivery. The store is one
    * 32-byte-key relation — persist it with the usual sink and this is
    * the daily-ingest loop.
    *
    * Folding deliveries through this step keeps exactly the docs a
    * whole-corpus [[Dedup.dropExactDuplicates]] would keep, when ids
    * rise across deliveries (min-id survivor ≡ first-delivery survivor)
    * — PropertySpec proves that invariant.
    */
  def ingestDelivery(fingerprintStore: DataFrame, incoming: DataFrame,
      idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, DataFrame) = {
    val fresh = graft.util.Parallelism.ensure(incoming)
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .join(fingerprintStore, Seq("__fp"), "left_anti")
    val w = Window.partitionBy("__fp").orderBy(col(idCol).asc)
    val kept = fresh.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val newStore = fingerprintStore
      .unionByName(kept.select("__fp")).distinct()
    (kept.drop("__fp"), newStore)
  }

  /** The empty fingerprint store an ingest loop starts from. */
  def emptyFingerprintStore(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("__fp", StringType))))
  }

  /** Per-slice report of the prepared corpus: kept count, kept share of
    * the raw corpus, mean quality, total normalized chars.
    */
  def corpusReport(docs: DataFrame, minQuality: Double,
      blockCol: String = "source"): DataFrame = {
    val kept = prepareCorpus(docs, minQuality)
      .groupBy(col(blockCol))
      .agg(count(lit(1)).as("kept_docs"),
        round(avg("quality"), 4).as("avg_quality"),
        sum(length(col("norm_text")).cast("long")).as("norm_chars"))
    val totals = docs.groupBy(col(blockCol)).agg(count(lit(1)).as("raw_docs"))
    totals.join(kept, Seq(blockCol), "left")
      .na.fill(0L, Seq("kept_docs", "norm_chars"))
      .select(col(blockCol), col("raw_docs"), col("kept_docs"),
        round(col("kept_docs") / col("raw_docs"), 4).as("kept_share"),
        col("avg_quality"), col("norm_chars"))
      .orderBy(blockCol)
  }

  /** Filter-funnel attrition report: apply a filter cascade and report,
    * per stage, how many rows survive stages 1..k and how many stage k
    * dropped — the per-filter accounting every curation pipeline
    * publishes next to its corpus ("N in, X after length, Y after
    * language, ...").
    *
    * Scale shape: ONE scan. Every stage predicate is evaluated in the
    * same projection, the cumulative conjunctions are per-row booleans,
    * and a single aggregate emits one sum per stage — no per-stage jobs,
    * no row materialization, no shuffle beyond the final stat row, which
    * a stack() pivots into (stage, name, n_pass, n_drop) rows
    * driver-free.
    */
  def filterFunnel(df: DataFrame, stages: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val cum = stages.scanLeft(lit(true)) { case (acc, (_, p)) => acc && p }.tail
    val sums = count(lit(1)).as("__n0") +:
      cum.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__n${i + 1}")
      }
    val one = df.agg(sums.head, sums.tail: _*)
    val stackArgs = ("0, 'input', __n0, CAST(0 AS BIGINT)" +:
      stages.zipWithIndex.map { case ((name, _), i) =>
        s"${i + 1}, '$name', __n${i + 1}, __n$i - __n${i + 1}"
      }).mkString(", ")
    one.selectExpr(
      s"stack(${stages.length + 1}, $stackArgs) as (stage, name, n_pass, n_drop)")
  }
}
