package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exactness baseline; the hyperplane-LSH
  * variant is the 100 TB path: each vector maps to a small bucket key, the
  * candidate join is per-bucket, and recall trades off against probe count.
  *
  * All math stays in Catalyst higher-order expressions (`zip_with` +
  * `aggregate` folds) — no UDF, so the dot products run inside codegen'd
  * stages and only (id, bucket/score) pairs ever shuffle. Arithmetic is
  * double precision either way vectors arrive: broadcast-side relations
  * cast float→double up front, while pair-join stages keep raw
  * `array<float>` through the shuffle (half the bytes) and let
  * [[graft.functions.ArrayDot]] widen per element — float→double is
  * exact, so both paths are bit-identical to the DuckDB oracle
  * (`::DOUBLE[]` + `list_cosine_similarity`).
  */
object Similarity {

  /** Dot product of two double arrays — the native codegen'd
    * [[graft.functions.ArrayDot]] (bit-identical fold order to the
    * built-ins form kept below for differential testing).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDot.arrayDot(a, b)

  /** Built-ins-only dot product (differential-test reference). */
  def dotBuiltins(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: for each query vector (vec_id in queryIds),
    * the k nearest neighbors among all other vectors.
    *
    * Plan shape: the query set is tiny → broadcast nested-loop against the
    * corpus (ONE scan of the big side, no shuffle of vectors), then a
    * per-query top-k window over (query_id, score) pairs. Ranking uses the
    * 4-dp-rounded score with vec_id tiebreak so ordering is identical in
    * the oracle.
    */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are precomputed per vector (not per pair): the pairwise stage
    // then folds only the dot product — 3× less interpreted-lambda work
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nqv"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("nqv") * col("nv")), 4).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** ANN-FIDELITY report: recall@k of the LSH tier ([[lshTopK]])
    * against the exact brute-force ranking ([[bruteForceTopK]]) — the
    * number that justifies (or indicts) the scale path: an ANN index
    * with recall 0.4 is a different operator than the one the user
    * asked for, and nothing else in the suite would say so. Per
    * query: how many of the true top-k the bucketed search returned.
    *
    * Both rankings use the same rounded-cosine total order, so the
    * intersection is exact set algebra; recall_ppm is one floor
    * division. Output per query: (query_id, n_exact, n_lsh, n_hits,
    * recall_ppm), query-ordered.
    */
  def annRecallReport(embeddings: DataFrame, queryIds: Seq[Long],
      k: Int): DataFrame =
    recallVsExact(embeddings, lshTopK(embeddings, queryIds, k),
      queryIds, k, approxCountCol = "n_lsh")

  /** Recall@k of ANY approximate ranking against the exact brute-force
    * top-k — [[annRecallReport]] generalized so every ANN tier gets the
    * same grade: LSH (q258), IVF (q261), PQ (q262), IVF-PQ (q263). A
    * recall cliff in any tier becomes a hash-red row the day it
    * happens, instead of hiding behind a plausible-looking ranking.
    *
    * `approx0` must carry (query_id, vec_id); extra columns are
    * dropped. Same exact set algebra as before: both rankings share
    * the rounded-cosine total order, recall_ppm is one floor division.
    * Output per query: (query_id, n_exact, <approxCountCol>, n_hits,
    * recall_ppm), query-ordered.
    */
  def recallVsExact(embeddings: DataFrame, approx0: DataFrame,
      queryIds: Seq[Long], k: Int,
      approxCountCol: String = "n_approx"): DataFrame = {
    val exact = bruteForceTopK(embeddings, queryIds, k)
      .select("query_id", "vec_id")
    val approx = approx0.select(col("query_id"), col("vec_id"))
    val hits = exact
      .join(approx.withColumn("hit", lit(1L)),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
    val approxCounts = approx.groupBy("query_id")
      .agg(count(lit(1)).as(approxCountCol))
    hits.join(approxCounts, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col(approxCountCol), lit(0L)).as(approxCountCol),
        col("n_hits"),
        expr("(n_hits * 1000000L) div n_exact").as("recall_ppm"))
      .orderBy("query_id")
  }

  /** MAXIMAL MARGINAL RELEVANCE rerank (public method: Carbonell &
    * Goldstein 1998) — diversity-aware top-k: greedily pick the
    * candidate maximizing λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s), so the
    * result covers the query's neighborhood instead of returning k
    * near-copies of the same passage — the selection a RAG context
    * builder or a diverse-sampling stage wants where plain top-k
    * returns redundancy. [[hardNegatives]]' diversity-side sibling.
    *
    * Exactness: relevance and pair similarities are the 4-dp rounded
    * cosines lifted to micro integers (the q36 cross-engine form);
    * scores are permille-weighted integer combinations
    * λ‰·rel − (1000−λ‰)·maxsim with (score desc, vec_id asc) total
    * order. Shape: ONE corpus scan pools the top-`poolN` candidates per
    * query (brute-force tier), the candidate×candidate similarity
    * relation is queries·poolN² STAT rows, and the greedy k-step
    * selection runs driver-side under the K-row allowance
    * ([[graft.util.Guards.countedCollect]]) — the same trade as
    * bradleyTerry: k tiny argmax passes beat 2k scheduled stages. The
    * oracle unrolls the identical k steps in CTEs.
    *
    * Output per query: (query_id, rank, vec_id, rel_micro, mmr_score)
    * with mmr_score in micro·permille units.
    */
  def mmrRerank(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      poolN: Int, lambdaPermille: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && poolN >= k, "k <= poolN")
    require(lambdaPermille >= 0 && lambdaPermille <= 1000, "lambda")
    val lam = lambdaPermille
    val cand = bruteForceTopK(embeddings, queryIds, poolN, idCol, vecCol)
      .select(col("query_id"), col("vec_id"),
        round(col("cos_sim") * 1e6).cast("long").as("rel"))
    val vecs = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    val cv = cand.join(vecs, Seq("vec_id"))
    val pairs = cv.as("a").join(cv.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.vec_id").as("da"), col("b.vec_id").as("db"),
        round(round(dot(col("a.v"), col("b.v")) /
          (col("a.nv") * col("b.nv")), 4) * 1e6).cast("long").as("sim"))
    val cRows = graft.util.Guards.countedCollect(cand, "mmrRerank")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pRows = graft.util.Guards.countedCollect(pairs, "mmrRerank")
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        r.getLong(3))).toMap
    val out = cRows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (q, cs) =>
        var rem = cs.map(c => (c._2, c._3)).sortBy(_._1).toList
        val sel = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        for (rank <- 1 to math.min(k, rem.size)) {
          val scored = rem.map { case (id, rel) =>
            val maxSim =
              if (sel.isEmpty) 0L
              else sel.map(s => pRows((q, id, s._3))).max
            (lam * rel - (1000L - lam) * maxSim, id, rel)
          }
          // (score desc, vec_id asc) — the oracle's total order
          val pick = scored.minBy { case (sc, id, _) => (-sc, id) }
          sel += ((pick._1, rank.toLong, pick._2))
          rem = rem.filterNot(_._1 == pick._2)
        }
        val relOf = cs.map(c => c._2 -> c._3).toMap
        sel.map { case (score, rank, id) =>
          (q, rank, id, relOf(id), score)
        }
    }
    val spark = embeddings.sparkSession
    import spark.implicits._
    out.toDF("query_id", "rank", "vec_id", "rel_micro", "mmr_score")
      .orderBy("query_id", "rank")
  }

  /** (query_id, vec_id, cos_sim) → top-k rows per query with 1-based
    * rank, ordered (cos_sim desc, vec_id asc).
    *
    * Uses the [[graft.functions.TopKBy]] aggregate, NOT a row_number
    * window: the window shuffles EVERY scored candidate into |queries|
    * partitions and sorts them — with few queries over a 100 TB corpus
    * that is a handful of tasks sorting the world. The aggregate's
    * partial phase reduces each map partition to ≤k candidates per query
    * before the shuffle, so the exchange carries O(|queries|·k) rows and
    * nothing is sorted but the final k-element arrays.
    */
  /** Hard-negative mining for contrastive training: for each anchor
    * (query) vector, the k most-similar corpus vectors with a DIFFERENT
    * label — exactly the "looks like the anchor but isn't" examples a
    * retrieval/embedding trainer wants in the denominator of its
    * InfoNCE loss.
    *
    * Composition of the [[bruteForceTopK]] exact tier: broadcast the
    * tiny anchor set against ONE corpus scan, drop same-label
    * candidates BEFORE scoring (self-pairs fall out with them — the
    * anchor shares its own label), then the [[graft.functions.TopKBy]]
    * bounded-heap per-anchor top-k (map-side partial reduction to ≤k
    * candidates per anchor; the exchange carries O(anchors·k) rows).
    * The ordering struct carries the negative's label through the heap —
    * (cos_sim, −vec_id) is already total, so the extra field never
    * decides a comparison. 100 TB path: [[hardNegativesLsh]]
    * (implemented, oracled by q169a).
    *
    * Output: (query_id, q_label, vec_id, neg_label, cos_sim, rank),
    * rank 1-based by (cos_sim desc, vec_id asc).
    */
  def hardNegatives(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"),
        col(labelCol).as("neg_label"))
      .withColumn("nv", norm(col("v")))
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nv").as("nqv"), col("neg_label").as("q_label"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("neg_label") =!= col("q_label"))
      .select(col("query_id"), col("q_label"), col("vec_id"),
        col("neg_label"),
        round(dot(col("qv"), col("v")) / (col("nqv") * col("nv")), 4)
          .as("cos_sim"))
    hardNegTail(scored, k)
  }

  /** Scored different-label candidates → per-anchor top-k negatives with
    * 1-based rank. Shared by the exact and LSH tiers — the bounded-heap
    * [[graft.functions.TopKBy]] partial-reduces each map partition to ≤k
    * candidates per anchor before the exchange.
    */
  private def hardNegTail(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id", "q_label")
      .agg(graft.functions.TopKBy.topKBy(
        struct(col("cos_sim"), (-col("vec_id")).as("nv"),
          col("neg_label")), k).as("top"))
      .select(col("query_id"), col("q_label"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("q_label"), (-col("t.nv")).as("vec_id"),
        col("t.neg_label").as("neg_label"), col("t.cos_sim").as("cos_sim"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("query_id", "rank")

  /** [[hardNegatives]] under the LSH candidate restriction — the 100 TB
    * tier: instead of scoring the anchor against the WHOLE corpus, only
    * vectors sharing one of the anchor's nPlanes+1 multi-probe buckets
    * ([[lshTopK]]'s probe scheme: own bucket + every Hamming-1 flip)
    * are candidates, so the join scales with bucket occupancy, not
    * corpus size. Candidates are a strict subset of the exact tier's —
    * a returned negative is always a TRUE different-label example with
    * its TRUE cosine; only completeness (recall of the very hardest
    * negatives) is approximate, which is acceptable for an InfoNCE
    * denominator. q169a pins this against a DuckDB oracle that rebuilds
    * the same bucket predicate; the restriction BINDS at sf0.01.
    *
    * Output: (query_id, q_label, vec_id, neg_label, cos_sim, rank) —
    * an anchor whose probe buckets hold no different-label vector emits
    * no rows (the exact tier would).
    */
  def hardNegativesLsh(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nPlanes: Int = 6, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"),
        col(labelCol).as("neg_label"))
      .withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
      .withColumn("nv", norm(col("v")))
    val probeSet = array(lit(0L) +: (0 until nPlanes).map(p => lit(1L << p)): _*)
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nv").as("nqv"), col("neg_label").as("q_label"),
        explode(transform(probeSet, m => col("bucket").bitwiseXOR(m)))
          .as("bucket"))
    val scored = corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("neg_label") =!= col("q_label"))
      // probe buckets are distinct per query, so a (query, vec) pair
      // matches at most once — no dedup needed (lshTopK's argument)
      .select(col("query_id"), col("q_label"), col("vec_id"),
        col("neg_label"),
        round(dot(col("qv"), col("v")) / (col("nqv") * col("nv")), 4)
          .as("cos_sim"))
    hardNegTail(scored, k)
  }

  /** Label-noise audit by neighborhood vote: for each anchor, how many
    * of its k nearest neighbors (ANY label, self excluded) share the
    * anchor's label — anchors out-voted by their own neighborhood are
    * the mislabeling suspects a labeled-set cleaning pass reviews
    * first (Confident-Learning-style signal from pure geometry).
    *
    * Same exact-tier shape as [[hardNegatives]] (broadcast anchors ×
    * ONE corpus scan, TopKBy bounded heap carrying the neighbor label;
    * the (cos_sim, −vec_id) order is total so the k-boundary is
    * deterministic), then a stat-grain vote per anchor. 100 TB path:
    * [[labelAgreementLsh]] (implemented, oracled by q179a).
    *
    * Output: (query_id, q_label, k_used, n_agree, agree_ppm, suspect) —
    * suspect = strict minority (2·n_agree < k_used).
    */
  def labelAgreement(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"),
        col(labelCol).as("nb_label"))
      .withColumn("nv", norm(col("v")))
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nv").as("nqv"), col("nb_label").as("q_label"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_label"), col("vec_id"),
        col("nb_label"),
        round(dot(col("qv"), col("v")) / (col("nqv") * col("nv")), 4)
          .as("cos_sim"))
    agreementTail(scored, k)
  }

  /** Scored any-label neighbor candidates → per-anchor k-NN vote.
    * Shared by the exact and LSH tiers.
    */
  private def agreementTail(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id", "q_label")
      .agg(graft.functions.TopKBy.topKBy(
        struct(col("cos_sim"), (-col("vec_id")).as("nv"),
          col("nb_label")), k).as("top"))
      .select(col("query_id"), col("q_label"), explode(col("top")).as("t"))
      .groupBy("query_id", "q_label")
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("t.nb_label") === col("q_label"), 1L).otherwise(0L))
          .as("n_agree"))
      .select(col("query_id"), col("q_label"), col("k_used"),
        col("n_agree"),
        expr("(n_agree * 1000000L) div k_used").as("agree_ppm"),
        (col("n_agree") * 2 < col("k_used")).as("suspect"))
      .orderBy("query_id")

  /** [[labelAgreement]] under the LSH candidate restriction — the
    * 100 TB label-noise audit: neighbors come only from the anchor's
    * nPlanes+1 multi-probe buckets ([[lshTopK]]'s scheme), so the vote
    * reads bucket-local geometry instead of a full corpus scan per
    * anchor. The k-NN set can differ from the exact tier's (LSH recall
    * is approximate), so the vote — and the suspect flag — is an
    * approximation whose candidates are still true vectors with true
    * cosines. q179a pins it against a DuckDB oracle rebuilding the same
    * bucket predicate; the restriction BINDS at sf0.01. An anchor with
    * no bucket-mates emits no row (exact tier always votes).
    *
    * Output: (query_id, q_label, k_used, n_agree, agree_ppm, suspect).
    */
  def labelAgreementLsh(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nPlanes: Int = 6, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"),
        col(labelCol).as("nb_label"))
      .withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
      .withColumn("nv", norm(col("v")))
    val probeSet = array(lit(0L) +: (0 until nPlanes).map(p => lit(1L << p)): _*)
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nv").as("nqv"), col("nb_label").as("q_label"),
        explode(transform(probeSet, m => col("bucket").bitwiseXOR(m)))
          .as("bucket"))
    val scored = corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_label"), col("vec_id"),
        col("nb_label"),
        round(dot(col("qv"), col("v")) / (col("nqv") * col("nv")), 4)
          .as("cos_sim"))
    agreementTail(scored, k)
  }

  /** Deterministic uniform negative sampling — [[hardNegatives]]'
    * baseline: k different-label examples per anchor chosen by a
    * reproducible hash order instead of similarity (the default
    * InfoNCE denominator; hard negatives are the upgrade, uniform ones
    * the control). Ranking key is `md5(query_id:vec_id)` — uniform,
    * anchor-specific, and computable verbatim in the SQL oracle, so
    * the "random" sample is hash-exact cross-engine. No vector math:
    * the corpus side projects (id, label) only.
    *
    * Output: (query_id, q_label, vec_id, neg_label, rank), rank
    * 1-based in hash order.
    */
  def randomNegatives(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      idCol: String = "vec_id", labelCol: String = "label"): DataFrame = {
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), col(labelCol).as("nb_label"))
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("nb_label").as("q_label"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("nb_label") =!= col("q_label"))
      .withColumn("h", md5(concat(col("query_id").cast("string"),
        lit(":"), col("vec_id").cast("string"))))
      .groupBy("query_id", "q_label")
      .agg(graft.functions.TopKBy.topKBy(
        struct(col("h"), (-col("vec_id")).as("nv"),
          col("nb_label")), k).as("top"))
      .select(col("query_id"), col("q_label"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("q_label"), (-col("t.nv")).as("vec_id"),
        col("t.nb_label").as("neg_label"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKBy.topKBy(
        struct(col("cos_sim"), (-col("vec_id")).as("nv")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (-col("t.nv")).as("vec_id"),
        col("t.cos_sim").as("cos_sim"), (col("pos") + 1).cast("int").as("rank"))

  // -------------------------------------------------------------------
  // Hyperplane LSH (random-projection signs)
  // -------------------------------------------------------------------

  /** Deterministic pseudo-random hyperplanes: plane p, dim j ↦ an integer
    * weight in [-105, 105] from a fixed affine-mod formula — reproducible
    * in SQL on both engines (no RNG state).
    */
  def planeWeight(p: Int, j: Int): Int = ((p * 131 + j * 137) % 211) - 105

  /** Bucket key: the sign-bit string of `nPlanes` projections. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val weights = array((0 until dim).map(j => lit(planeWeight(p, j).toDouble)): _*)
      when(dot(vec, weights) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN top-k with multi-probe: each query searches its own
    * bucket plus every Hamming-1 neighbor bucket (flip one hyperplane
    * sign), i.e. nPlanes+1 probes — single-probe recall on random vectors
    * is poor because true neighbors often differ in exactly one marginal
    * plane. The corpus is scanned once to compute buckets; the probe set
    * (tiny — queries × probes) broadcasts, so the candidate join replaces
    * the full cross join and scales with bucket occupancy, not corpus².
    * Recall vs [[bruteForceTopK]] is measured in SimilaritySpec.
    */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      nPlanes: Int = 6, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
      .withColumn("nv", norm(col("v")))
    val probeSet = array(lit(0L) +: (0 until nPlanes).map(p => lit(1L << p)): _*)
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nqv"),
        explode(transform(probeSet, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    val scored = corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      // probe buckets are distinct per query (distinct XOR masks), so a
      // (query, vec) pair matches at most once — no dedup needed
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("nqv") * col("nv")), 4).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  // -------------------------------------------------------------------
  // IVF (inverted-file) ANN
  // -------------------------------------------------------------------

  /** IVF cell assignment: nearest centroid by rounded cosine (ties to the
    * smallest centroid id). Centroids here are a fixed subset of the
    * corpus — real IVF would k-means-train them; the training step is the
    * only stub, the partition/search plumbing is the production shape.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("nv"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nv") * col("ncv")), 4).as("ccos"))
    // argmax as a max_by aggregate with a total ordering (ccos desc, cid
    // asc), not a per-vec window: partial aggregation collapses each map
    // partition to one row per vector BEFORE the shuffle, so the exchange
    // carries corpus rows, not corpus×K scored rows (q06 pattern)
    scored.groupBy("vec_id")
      .agg(max_by(struct(col("v"), col("nv"), col("cid")),
        struct(col("ccos"), -col("cid"))).as("m"))
      .select(col("vec_id"), col("m.v").as("v"), col("m.nv").as("nv"),
        col("m.cid").as("cell"))
  }

  /** K-means training for IVF centroids: Lloyd iterations expressed as
    * DataFrame ops — assign (one corpus scan + broadcast centroids), then
    * recompute each cell's centroid as the element-wise mean of its
    * members (posexplode → per-(cell, dim) partial+final avg → re-pack).
    * Deterministic: seeded from explicit init ids, fixed iteration count,
    * ties in assignment break to the smallest centroid id. Cells that
    * lose all members die (standard Lloyd behavior).
    *
    * Scale shape per iteration: one shuffle keyed by (cell, dim) whose
    * size is corpus × dim scalars — map-side partial aggregation reduces
    * it to (#cells × dim) per partition before the exchange. Each round's
    * centroids are re-broadcast; lineage is cut by materializing the tiny
    * centroid relation per iteration.
    */
  def ivfTrain(embeddings: DataFrame, initIds: Seq[Long], iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    var centroids = corpus.filter(col("vec_id").isin(initIds: _*))
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nv").as("ncv"))
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(corpus, centroids)
      val next = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell").agg(
          array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cid"),
          transform(col("pm"), s => s.getField("m")).as("cv"))
        .withColumn("ncv", norm(col("cv")))
      // materialize the (tiny) centroid relation so iteration lineage
      // doesn't stack corpus-wide plans K-deep; K centroids × dim doubles
      // is driver-safe at any corpus scale
      centroids = spark.createDataFrame(
        java.util.Arrays.asList(next.collect(): _*), next.schema)
    }
    centroids
  }

  /** Oracle-exact k-means (the hash-pinnable twin of [[ivfTrain]]):
    * Lloyd rounds where every cross-engine hazard is removed —
    * distances are sequential L2 folds (identical fold order to DuckDB's
    * `list_reduce`), per-vector distances collapse to MICRO-integers
    * before any aggregate (integer sums are combine-order-independent),
    * and centroid means divide micro-integer sums (one double division,
    * same association both engines). Assignment ties break to the
    * smallest centroid id on the micro distance.
    *
    * Returns the final-assignment census: `(cell, n_vecs,
    * inertia_micro)` — cluster sizes and the summed micro-L2² cost, the
    * convergence diagnostic a training loop monitors.
    *
    * Scale shape per round: ONE corpus scan + K-row broadcast for
    * assignment (max_by partial aggregation, never a corpus×K shuffle),
    * one (cell, dim)-keyed mean whose exchange carries #cells × dim
    * rows after partial agg, and a K-row driver materialization
    * (documented safe — K × dim doubles).
    */
  def kmeansReport(embeddings: DataFrame, initIds: Seq[Long], rounds: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(rounds >= 1, "need at least one assignment round")
    val spark = embeddings.sparkSession
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    var centroids = corpus.filter(col("vec_id").isin(initIds: _*))
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    def assign(cs: DataFrame): DataFrame = {
      val d2 = aggregate(zip_with(col("v"), col("cv"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, t) => acc + t)
      corpus.crossJoin(broadcast(cs))
        .select(col("vec_id"), col("v"), col("cid"),
          round(d2 * 1000000.0).cast("long").as("d2_micro"))
        .groupBy("vec_id")
        .agg(min_by(struct(col("v"), col("cid"), col("d2_micro")),
          struct(col("d2_micro"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.v").as("v"),
          col("m.cid").as("cell"), col("m.d2_micro").as("d2_micro"))
    }
    for (_ <- 1 until rounds) {
      val next = assign(centroids)
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg((sum(round(col("x") * 1000000.0).cast("long")).cast("double")
          / count(lit(1)) / 1000000.0).as("m"))
        .groupBy("cell").agg(
          array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cid"),
          transform(col("pm"), s => s.getField("m")).as("cv"))
      centroids = spark.createDataFrame(
        java.util.Arrays.asList(next.collect(): _*), next.schema)
    }
    assign(centroids)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        sum("d2_micro").as("inertia_micro"))
      .orderBy("cell")
  }

  /** IVF top-k ANN: assign every vector to its nearest centroid's cell
    * (one scan + broadcast of K centroids), then brute-force rank within
    * the `nprobe` cells nearest each QUERY. At scale the per-cell join
    * replaces the full cross join; recall vs nprobe is the standard IVF
    * tradeoff (nprobe=1 searches only the query's own cell — that is the
    * oracle-matched q42 configuration; raising nprobe widens the candidate
    * set and recall monotonically, measured in SimilaritySpec).
    */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      centroidIds: Seq[Long], idCol: String = "vec_id",
      vecCol: String = "embedding", nprobe: Int = 1): DataFrame = {
    val corpus = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", norm(col("v")))
    val centroids = corpus.filter(col("vec_id").isin(centroidIds: _*))
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nv").as("ncv"))
    ivfTopKWith(corpus, queryIds, k, centroids, nprobe)
  }

  /** [[ivfTopK]] against an explicit centroid relation (cid, cv, ncv) —
    * e.g. one produced by [[ivfTrain]].
    */
  def ivfTopKWith(corpus: DataFrame, queryIds: Seq[Long], k: Int,
      centroids: DataFrame, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val cells = ivfAssign(corpus, centroids)
    val queries =
      if (nprobe == 1)
        // single-probe: the query's probe cell IS its own assignment —
        // reuse the corpus-wide assignment, no extra centroid scoring
        cells.filter(col("vec_id").isin(queryIds: _*))
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nv").as("nqv"), col("cell"))
      else {
        // multi-probe: score each query against ALL centroids and keep its
        // nprobe nearest cells. The window runs on the query relation only
        // (a handful of rows — the broadcast-small side), so the "windows
        // sort the world" concern from topKPerQuery does not apply here.
        val qVecs = corpus.filter(col("vec_id").isin(queryIds: _*))
        val probeScores = qVecs.crossJoin(broadcast(centroids))
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nv").as("nqv"), col("cid"),
            round(dot(col("v"), col("cv")) / (col("nv") * col("ncv")), 4).as("ccos"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("ccos").desc, col("cid").asc)
        probeScores.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= nprobe)
          .select(col("query_id"), col("qv"), col("nqv"), col("cid").as("cell"))
      }
    // probe cells are distinct per query and each corpus vector lives in
    // exactly one cell, so a (query, vec) pair matches at most once
    val scored = cells.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("nqv") * col("nv")), 4).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** Per-label embedding profile: member count, mean vector norm, and
    * mean cosine of members to their label centroid (cohesion). One
    * corpus scan for the centroid (posexplode + per-dim partial/final
    * avg), one for the cohesion join — centroids broadcast.
    */
  def labelProfile(embeddings: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), col(labelCol).as("label"),
        asDouble(col(vecCol)).as("v"))
    val centroids = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"))
      .groupBy("label").agg(
        array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), transform(col("pm"), s => s.getField("m")).as("cv"))
    e.join(broadcast(centroids), "label")
      .select(col("label"), col("v"),
        cosine(col("v"), col("cv")).as("cc"), norm(col("v")).as("nv"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("nv"), 4).as("avg_norm"),
        round(avg("cc"), 4).as("avg_centroid_cos"))
      .orderBy("label")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold within a blocking
    * column (label here; an LSH bucket at scale). Thresholds compare the
    * 4-dp-rounded value so the oracle cut is identical.
    */
  def nearDupPairs(embeddings: DataFrame, blockCol: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // raw float arrays, NOT cast to double: the self-join below
    // duplicates a vector into every candidate pair row, so element
    // width is the stage's shuffle cost — ArrayDot widens per element
    // inside the kernel (exact), halving the bytes shipped
    val e = graft.util.Parallelism.ensure(embeddings)
      .select(col(idCol).as("vec_id"), col(blockCol).as("block"),
        col(vecCol).as("v"))
      .withColumn("nv", norm(col("v")))
    val a = e.select(col("vec_id").as("vec_a"), col("block"), col("v").as("va"),
      col("nv").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("block"), col("v").as("vb"),
      col("nv").as("nb"))
    a.join(b, Seq("block")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos_sim") >= threshold)
      .select("vec_a", "vec_b", "cos_sim")
  }

  /** Semantic dedup (SemDedup-style): keep ONE representative per
    * embedding near-dup cluster — the connected component of
    * cosine ≥ threshold pairs within blocks — the embedding-space
    * analogue of exact dedup's keep-min-per-fingerprint. The kept row is
    * the cluster's minimum id; rows in no near-dup pair keep themselves.
    *
    * Scale shape: the pair stage is [[nearDupPairs]] (blocked, never
    * all-pairs); the closure is [[Dedup.connectedComponents]]
    * (min-label propagation over the PAIR relation — near-dup-sized,
    * not corpus-sized); the final keep decision is a left join of the
    * corpus against the cluster relation keyed by the high-cardinality
    * id, broadcast when small.
    */
  def semanticDedup(embeddings: DataFrame, blockCol: String,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val pairs = nearDupPairs(embeddings, blockCol, threshold, idCol, vecCol)
    val cc = Dedup.connectedComponents(pairs, "vec_a", "vec_b")
      .withColumnRenamed("doc_id", idCol)
    embeddings.join(cc, Seq(idCol), "left")
      .filter(col("cluster").isNull || col("cluster") === col(idCol))
      .drop("cluster")
  }

  /** The 100 TB path of [[semanticDedup]]: block by the deterministic
    * hyperplane LSH bucket instead of a metadata column — needs no label,
    * and the pairwise stage is bounded by bucket occupancy (corpus /
    * 2^nPlanes expected) rather than metadata-group size. Near-identical
    * vectors agree on every projection sign with high probability, so
    * they share a bucket; recall loss is pairs that straddle a hyperplane
    * (mitigate with more buckets of fewer planes upstream — same trade as
    * [[lshTopK]]'s probes). Fully deterministic (fixed planes), so the
    * capped pipeline oracles exactly.
    */
  def semanticDedupLsh(embeddings: DataFrame, threshold: Double,
      nPlanes: Int = 6, dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucketSize: Option[Long] = None): DataFrame = {
    val bucketed = embeddings.withColumn("__bucket",
      lshBucket(asDouble(col(vecCol)), nPlanes, dim))
    // SCALE NOTE (round-13): with FIXED nPlanes the bucket count is
    // fixed, so occupancy grows linearly with the corpus and the pair
    // stage quadratically — the measured α ≈ 1 of the oracled 3-plane
    // call is this, not skew. Production sizes nPlanes to the corpus
    // (buckets ≈ n / target occupancy keeps the pair stage linear) and
    // belts it with `maxBucketSize`: buckets past the cap skip the
    // pair stage entirely — their rows all keep themselves — the q61
    // hot-bucket trade (deterministic, documented recall loss on
    // over-dense regions), so one boilerplate-dense bucket can never
    // go quadratic regardless of the plane count chosen.
    val paired = maxBucketSize match {
      case None => bucketed
      case Some(cap) =>
        val hot = bucketed.groupBy("__bucket")
          .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
          .select("__bucket")
        bucketed.join(broadcast(hot), Seq("__bucket"), "left_anti")
    }
    val pairs = nearDupPairs(paired, "__bucket", threshold, idCol, vecCol)
    val cc = Dedup.connectedComponents(pairs, "vec_a", "vec_b")
      .withColumnRenamed("doc_id", idCol)
    bucketed.join(cc, Seq(idCol), "left")
      .filter(col("cluster").isNull || col("cluster") === col(idCol))
      .drop("cluster", "__bucket")
  }

  /** Sample covariance matrix of the embedding space — the sufficient
    * statistic behind PCA whitening, Mahalanobis outlier scoring, and
    * drift detection richer than [[EmbeddingDrift]]'s per-dimension
    * means.
    *
    * Shape: ONE scan folding into a single [[graft.functions.Gram]]
    * buffer (partial aggregation carries one ~17 KB buffer per map
    * partition — no d² row blow-up ever materializes); the d(d+1)/2
    * output cells then unfold from the one stat row, with per-dimension
    * sums looked up from the SAME row's comps array (no join).
    *
    * Integer core per cell (i ≤ j, 1-based): `cov_num = n·Σxᵢxⱼ −
    * Σxᵢ·Σxⱼ` in micro²-units, exact in Long through ~3·10⁹ rows at
    * unit-norm scale; `cov = cov_num / (n·(n−1)) / 10¹²` at 9 dp is the
    * only double.
    */
  def covarianceMatrix(embeddings: DataFrame, vecCol: String = "embedding",
      quantScale: Double = 1e6): DataFrame = {
    val q = transform(col(vecCol).cast("array<double>"),
      x => round(x * quantScale).cast("long"))
    embeddings
      .agg(graft.functions.Gram.gram(q).as("g"))
      .select(col("g.n").as("n"), col("g.comps").as("comps"),
        explode(col("g.pairs")).as("p"))
      .select(col("n"), col("p.i").as("i"), col("p.j").as("j"),
        col("p.s").as("s_xy"),
        element_at(col("comps"), col("p.i")).getField("s").as("s_x"),
        element_at(col("comps"), col("p.j")).getField("s").as("s_y"))
      .withColumn("cov_num",
        col("n") * col("s_xy") - col("s_x") * col("s_y"))
      .withColumn("cov",
        when(col("n") > 1, round(
          col("cov_num").cast("double") /
            (col("n").cast("double") * (col("n") - 1)) / (quantScale * quantScale),
          9)))
      .select("i", "j", "n", "s_x", "s_y", "s_xy", "cov_num", "cov")
      .orderBy("i", "j")
  }

  /** Top covariance eigenvector by UNROLLED power iteration — the PCA
    * direction that explains the most embedding variance, computed
    * relationally: the d×d covariance (one Gram pass,
    * [[covarianceMatrix]]) mirrors to its full symmetric (i, j,
    * cov_num) relation and each round is matvec-as-join over d² stat
    * rows, ∞-norm-renormalized. A fixed round count unrolls into one
    * DAG (the pageRank/BPE convention) and — because every step is
    * integer micro with the sign split off before the floor division
    * (Spark `div` truncates, SQL `//` floors; on NON-NEGATIVE operands
    * they agree, so v = sign·(|w|·10⁶ div max|w|)) — the SQL oracle
    * replays it bit-exactly.
    *
    * Output (dim-grain): (dim, v_micro, lambda) — v the ∞-normalized
    * eigenvector estimate after `rounds` iterations, lambda the
    * Rayleigh quotient in cov units as an EXACT floor integer
    * (sign·(|vᵀCv| div vᵀv) off the DECIMAL sums, repeated per row —
    * at λ ~ 10¹⁵ a double quotient differs across engines by a full
    * ULP unit, so only the integer form hashes).
    */
  def topEigenReport(embeddings: DataFrame, rounds: Int = 3,
      vecCol: String = "embedding"): DataFrame = {
    require(rounds >= 1, "rounds")
    val dec = "decimal(38,0)"
    val cov0 = covarianceMatrix(embeddings, vecCol)
      .select(col("i"), col("j"), col("cov_num"))
    val cov = graft.util.Caches.cached(cov0.unionByName(
      cov0.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov_num"))))
    def matvec(v: DataFrame): DataFrame = cov
      .join(v.select(col("dim").as("j"), col("v_micro")), Seq("j"))
      .groupBy(col("i").as("dim"))
      .agg(sum(col("cov_num").cast(dec) * col("v_micro")).as("w"))
    var v = cov.select(col("i").as("dim")).distinct()
      .select(col("dim"), lit(1000000L).as("v_micro"))
    for (_ <- 1 to rounds) {
      // w feeds TWO consumers (the ∞-norm agg and the renormalize) and
      // v compounds across rounds — localCheckpoint (the Graph/Dedup
      // round idiom, d stat rows) truncates the lineage so the DAG
      // stays O(1) per round instead of doubling; without it the
      // unrolled plan re-derives each round's matvec 2^round times
      // and analysis/codegen time creeps run-over-run
      val w = matvec(v).localCheckpoint()
      val mx = w.agg(max(abs(col("w"))).as("mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("dim"),
          (signum(col("w").cast("double")).cast("long") *
            expr("cast((abs(w) * 1000000) div " +
              "greatest(mx, cast(1 as decimal(38,0))) as bigint)"))
            .as("v_micro"))
    }
    val vc = graft.util.Caches.cached(v)
    val w = matvec(vc)
    // lambda is EXACT: sign·(|num| div den) on the DECIMAL sums. The
    // round-9 sf0.001 artifact caught the old double quotient: at
    // λ ≈ 5.8e15 one ULP is 1.0, so the two engines' division differed
    // by a full unit and round(·,6) could not hide it — the integer
    // floor is the only cross-engine-stable form at this magnitude.
    val ray = vc.join(w, Seq("dim"))
      .agg(sum(col("v_micro").cast(dec) * col("w")).as("num"),
        sum(col("v_micro").cast(dec) * col("v_micro")).as("den"))
      .select(when(col("den") > 0,
        signum(col("num").cast("double")).cast("long") *
          expr("cast(abs(num) div den as bigint)"))
        .as("lambda"))
    vc.crossJoin(broadcast(ray)).select("dim", "v_micro", "lambda")
      .orderBy("dim")
  }

  /** Sign threshold for [[randomProjection]]'s ±1 matrix: hashes below
    * it map to +1 (≈ half of [[Sampling.HashMod]]).
    */
  val RpSignThreshold = 500000003L

  /** Deterministic ±1 random projection (Johnson–Lindenstrauss sketch):
    * reduce each embedding to `k` dimensions via a FIXED sign matrix —
    * R(i,j) = ±1 from the house Knuth hash of i·k+j — so the projection
    * is reproducible run-to-run and cross-engine (the [[lshBucket]]
    * hyperplanes' dense cousin; this keeps magnitudes for downstream
    * distance work rather than collapsing to a bucket id).
    *
    * Scale shape: pure scan-stage arithmetic — per row, k
    * `aggregate(zip_with(...))` integer folds over the quantized
    * vector; no shuffle, no state, output is (id, j, component). The
    * sign matrix materializes as k LITERAL arrays (d·k ints in the
    * plan), never a relation — nothing joins.
    *
    * Components are exact integer micro-units: Σᵢ round(xᵢ·10⁶)·R(i,j).
    * (The conventional 1/√k scale is a presentation constant — left to
    * callers so the stored component stays integer.)
    */
  def randomProjection(embeddings: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = Sampling.HashMod
    def sign(i: Int, j: Int): Long = {
      val h = (((i.toLong * k + j) % p) * 2654435761L) % p
      if (h < RpSignThreshold) 1L else -1L
    }
    val q = transform(col(vecCol).cast("array<double>"),
      x => round(x * 1e6).cast("long"))
    val comps = (0 until k).map { j =>
      val signs = array((0 until dim).map(i => lit(sign(i, j))): _*)
      aggregate(zip_with(q, signs, (x, s) => x * s), lit(0L),
        (acc, v) => acc + v)
    }
    embeddings
      .select(col(idCol).as("vec_id"),
        posexplode(array(comps: _*)).as(Seq("j0", "comp_micro")))
      .select(col("vec_id"), (col("j0") + 1).as("j"), col("comp_micro"))
      .orderBy("vec_id", "j")
  }
}
