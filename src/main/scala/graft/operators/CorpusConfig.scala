package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{ProfileConfig, Profiler}

/** The ONE SWITCH between the exact (oracle) tier and the 100 TB
  * production tier, so running the engine at scale is a config choice,
  * not per-call knowledge of which knob lives on which operator.
  *
  * Every axis it wires exists — and is oracle-pinned — individually:
  *  - [[DedupConfig]] stop-shingle + LSH bucket caps (q61/q61a, q97a)
  *  - [[ProfileConfig]] exact vs sketch moments/percentiles/distincts
  *    (q11 is the exact tier, q43/q43a the sketch tier)
  *  - source-overlap stop-shingle cap (q76/q76a)
  *  - exact window-ranked vs approx-bound deciles (q58/q58a)
  *
  * [[CorpusConfig.Exact]] reproduces every exact-tier oracle;
  * [[CorpusConfig.Production]] is what a 1000-executor run over 100 TB
  * should use: all pair-join fan-outs capped, all single-pass sketch
  * statistics, no corpus-scale windows.
  */
final case class CorpusConfig(
    dedup: DedupConfig,
    profile: ProfileConfig,
    maxShingleSources: Option[Long],
    exactDeciles: Boolean,
    decileAccuracy: Int = 10000,
    passageFingerprint: Boolean = false,
    annLshConsumers: Boolean = false,
    linkageSortedNeighborhood: Boolean = false,
    graphWedgeCap: Option[Long] = None) {

  /** Adamic–Adar link prediction at this tier's wedge budget: exact =
    * every common neighbor counts (Σ deg² wedges — 142M on the sf0.1
    * co-purchase graph); production = centers above the cap are
    * dropped BEFORE the quadratic fan-out (q233 vs q233a, both
    * oracle-pinned; on dense graphs the cap BINDS — it is a semantic
    * knob, not a free speedup, which is why it lives here and not as
    * a hardcoded default).
    */
  def adamicAdarTopK(edges: DataFrame, k: Int): DataFrame =
    Graph.adamicAdarTopK(edges, k, graphWedgeCap)

  /** Record-linkage candidate pairs at this tier's blocking: exact =
    * every within-block pair (Σ n_block² — the oracle tier); production
    * = sorted-neighborhood on `sortCol` buckets of `bucketWidth`
    * (same/adjacent bucket only — linear in block size; q210 vs q210a,
    * both oracle-pinned, SN ⊆ blocked spec-pinned).
    */
  def linkagePairs(df: DataFrame, blockCol: String, sortCol: String,
      bucketWidth: Long, idCol: String): DataFrame =
    if (linkageSortedNeighborhood)
      Linkage.sortedNeighborhoodPairs(df, blockCol, sortCol, bucketWidth, idCol)
    else Linkage.blockedPairs(df, blockCol, idCol)

  /** Hard-negative mining at this tier's candidate scope: exact
    * broadcast-anchor corpus scan, or the LSH multi-probe restriction
    * (q169 vs q169a — both oracle-pinned).
    */
  def hardNegatives(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame =
    if (annLshConsumers) Similarity.hardNegativesLsh(embeddings, queryIds, k)
    else Similarity.hardNegatives(embeddings, queryIds, k)

  /** Label-noise kNN vote at this tier's candidate scope (q179 vs
    * q179a).
    */
  def labelAgreement(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame =
    if (annLshConsumers) Similarity.labelAgreementLsh(embeddings, queryIds, k)
    else Similarity.labelAgreement(embeddings, queryIds, k)

  /** Per-doc passage-sharing census at this tier's key width (exact =
    * raw passage strings; production = 64-bit xxhash fingerprints, the
    * ~10× lighter shuffle — q155a pins the two tiers equal).
    */
  def passageDupStats(docs: DataFrame, passageWords: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.passageDupStats(docs, passageWords, idCol, textCol,
      fingerprint = passageFingerprint)

  /** Near-dup pairs by blocked Jaccard under this tier's shingle cap. */
  def jaccardPairs(docs: DataFrame, blockCol: String, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.jaccardPairs(docs, blockCol, threshold, idCol, textCol,
      maxShingleDocs = dedup.maxShingleDocs)

  /** Directed containment pairs under this tier's shingle cap. */
  def containmentPairs(docs: DataFrame, blockCol: String, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.containmentPairs(docs, blockCol, threshold, idCol, textCol,
      maxShingleDocs = dedup.maxShingleDocs)

  /** MinHash/LSH near-dup pairs under this tier's bucket cap. */
  def minhashNearDups(docs: DataFrame, k: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Dedup.minhashNearDups(docs, k, rowsPerBand, threshold, idCol, textCol,
      maxBucketSize = dedup.maxBucketSize)

  /** Pairwise source-overlap matrix under this tier's source cap. */
  def sourceOverlap(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame =
    CorpusStats.sourceOverlap(docs, groupCol, textCol,
      maxShingleSources = maxShingleSources)

  /** Whole-table numeric profile at this tier's exactness. */
  def numericProfile(df: DataFrame): DataFrame =
    Profiler.numericProfile(df, profile)

  /** Per-group decile report at this tier's exactness (exact = ntile
    * window; production = broadcast approx bounds, no window).
    */
  def decileReport(df: DataFrame, groupCol: String, valCol: String,
      orderCol: String, n: Int = 10): DataFrame =
    Deciles.report(df, groupCol, valCol, orderCol, n,
      exact = exactDeciles, accuracy = decileAccuracy)

  /** The q71 capstone under this tier, near-dup included: normalize →
    * quality-filter → exact-dedup ([[Pipeline.prepareCorpus]]) →
    * MinHash near-dup removal (pairs under this tier's caps; survivor
    * per pair-cluster = min doc_id over [[Dedup.connectedComponents]])
    * → token-window chunking → token-budget shard packing → per-(source,
    * shard) rollup: `(source, shard, n_chunks, shard_tokens)`.
    */
  def prepareTrainingShards(docs: DataFrame, minQuality: Double,
      chunkWindow: Int, chunkStride: Int, shardBudgetTokens: Long,
      ordShift: Int = 20): DataFrame = {
    val kept = Pipeline.prepareCorpus(docs, minQuality)
    val pairs = minhashNearDups(
      kept.select(col("doc_id"), col("norm_text").as("text")))
    // survivor per near-dup cluster = the cluster's min doc_id; docs in
    // no pair never appear in the component relation and all survive
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"))
    val surv = kept.join(losers, Seq("doc_id"), "left_anti")
    val chunks = Chunk.chunkByTokens(
      surv.select(col("doc_id"), col("source"),
        col("norm_text").as("text")),
      chunkWindow, chunkStride, carryCols = Seq("source"))
    val slim = graft.util.Caches.cached(
      chunks.select(col("source"), col("n_tokens"),
        ((col("doc_id") * (1L << ordShift)) + col("chunk_idx")).as("__ord")))
    Pack.assignShards(slim, shardBudgetTokens, "source",
      tokensCol = "n_tokens", orderCol = "__ord")
      .groupBy("source", "shard")
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_tokens").cast("long").as("shard_tokens"))
      .orderBy("source", "shard")
  }
}

object CorpusConfig {
  /** Oracle tier: exact everywhere, intermediates unbounded. */
  val Exact: CorpusConfig = CorpusConfig(DedupConfig.Exact,
    ProfileConfig(), maxShingleSources = None, exactDeciles = true)

  /** 100 TB tier: capped pair joins, sketch statistics, no
    * corpus-scale windows. The source cap matches the stop-shingle doc
    * cap's rationale (a shingle in >1024 slices discriminates nothing).
    */
  val Production: CorpusConfig = CorpusConfig(DedupConfig.Production,
    ProfileConfig(exact = false), maxShingleSources = Some(1024L),
    exactDeciles = false, passageFingerprint = true,
    annLshConsumers = true, linkageSortedNeighborhood = true,
    graphWedgeCap = Some(64L))
}
