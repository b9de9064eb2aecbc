package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Chunk, Dedup, Deciles, Mixture, Pack,
  Pipeline, Sampling, Similarity, Split, TextOps}

/** Round-5 queries: the scale-safe decile axis (q58a), the remaining
  * as-of-join quadrants oracled against DuckDB's native ASOF variants
  * (q62a strict, q62b left), the leakage-safe split (q64a) oracled via
  * the recursive-CTE connected components composed with the split hash
  * CASE, plus six new pipeline operators — token-window chunking (q66),
  * incremental exact dedup against an existing corpus (q67), stratified
  * deterministic sampling (q68), target-share mixture rebalancing
  * (q69), SemDedup-style semantic dedup (q70), and the corpus-build
  * capstone chaining normalize→filter→dedup→chunk→pack in one plan
  * (q71).
  *
  * Oracle conventions as in [[LlmQueries]]: identical aliases, identical
  * rounding, deterministic total ORDER BY on both sides. q58a is the one
  * rows-only entry here — its boundaries come from `approx_percentile`
  * (a Greenwald-Khanna sketch, engine-specific by construction, same
  * justification as q43); Round5Spec pins its populations against the
  * exact deciles instead.
  */
object Round5Queries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The approx-decile boundary FIDELITY report: the scale path's
    // percentile_approx boundaries graded in-plan against the exact
    // per-source quantiles — q_exact is oracle-hashable, within_bound
    // is the frozen ±0.01-quantile window check. Fully driver-green;
    // the production approx tier itself stays Deciles.report(exact =
    // false), spec-pinned in Round5Spec.
    "q58a_token_deciles_approx" -> ((s, dir) =>
      Deciles.boundaryFidelity(
        docs(s, dir)
          .select(col("source"), col("doc_id"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "n_tokens")),

    // As-of join, strictly-before quadrant: each click attributed to the
    // most recent purchase with ts < click ts (ASOF `>`): a purchase at
    // the exact click instant no longer matches.
    "q62a_asof_strict" -> ((s, dir) => {
      val (clicks, purchases) = asofSides(s, dir)
      AsOfJoin.asofLast(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("p_event", "p_value"), inclusive = false)
        .orderBy("user_id", "event_id")
    }),

    // As-of join, LEFT quadrant: clicks with no preceding purchase are
    // kept with null payload.
    "q62b_asof_left" -> ((s, dir) => {
      val (clicks, purchases) = asofSides(s, dir)
      AsOfJoin.asofLast(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("p_event", "p_value"), joinType = "left")
        .orderBy("user_id", "event_id")
    }),

    // Leakage-safe split: every near-dup CLUSTER (connected component of
    // the verified MinHash pairs) lands in one split; per (split, source)
    // doc counts, same rollup as q64.
    "q64a_split_leakage_safe" -> ((s, dir) => {
      val d = docs(s, dir)
      Split.assignSplitsLeakageSafe(d, Dedup.minhashNearDups(d),
        Round4Queries.SplitWeights)
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "source")
    }),

    // Token-window chunking: scan-stage row multiplication, no shuffle;
    // every chunk row is oracle-compared including its text.
    "q66_chunking" -> ((s, dir) =>
      Chunk.chunkByTokens(docs(s, dir), ChunkWindow, ChunkStride)
        .orderBy("doc_id", "chunk_idx")),

    // Incremental exact dedup: the doc_id % BenchMod == 0 slice plays the
    // already-ingested corpus, the rest the incoming delivery; per-source
    // accounting of new/known/within-batch duplicates.
    "q67_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val existing = d.filter(col("doc_id") % Round3Queries.BenchMod === 0)
      val incoming = d.filter(col("doc_id") % Round3Queries.BenchMod =!= 0)
      Dedup.incrementalReport(incoming, existing, "source")
    }),

    // Stratified deterministic sampling: per-stratum keep rates, still a
    // pure scan-stage hash filter (no shuffle, no window).
    "q68_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(docs(s, dir), "source", StratRates, StratDefault)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"))
        .orderBy("source")),

    // Mixture rebalancing: rates DERIVED from target shares inside the
    // plan (stat-row agg + scalar min + broadcast), then the scan-stage
    // hash filter; strata outside the target mix are dropped.
    "q69_mixture_rebalance" -> ((s, dir) =>
      Mixture.rebalance(docs(s, dir), "source", MixShares)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source")),

    // The full corpus-build capstone, ONE declarative plan: normalize →
    // quality-filter → exact-dedup (Pipeline.prepareCorpus) → token-window
    // chunking of the normalized text → token-budget shard packing of the
    // chunks (distributed prefix sum) → per-(source, shard) rollup.
    // Catalyst sees every stage at once: normalization fuses into the
    // scan, the quality filter prunes before the dedup shuffle, chunking
    // multiplies rows scan-stage, and packing adds its bounded stat-row
    // machinery on top.
    "q71_corpus_pipeline" -> ((s, dir) => {
      val kept = Pipeline.prepareCorpus(docs(s, dir), minQuality = 0.5)
      val chunks = Chunk.chunkByTokens(
        kept.select(col("doc_id"), col("source"),
          col("norm_text").as("text")),
        ChunkWindow, ChunkStride, carryCols = Seq("source"))
      // packing's two passes (subtotals + rebase) would otherwise re-run
      // the whole normalize→dedup→chunk pipeline twice; cache the SLIM
      // chunk relation (3 columns, no chunk text — ~30 bytes/row, released
      // via Caches.releaseAll) so both passes read materialized stat rows
      val slim = graft.util.Caches.cached(
        chunks.select(col("source"), col("n_tokens"),
          ((col("doc_id") * (1L << ChunkOrdShift)) + col("chunk_idx")).as("__ord")))
      Pack.assignShards(slim, Round4Queries.ShardBudgetTokens, "source",
        tokensCol = "n_tokens", orderCol = "__ord")
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n_chunks"),
          sum("n_tokens").cast("long").as("shard_tokens"))
        .orderBy("source", "shard")
    }),

    // Semantic dedup (SemDedup): per-label vec counts before/after
    // keeping one representative per embedding near-dup cluster.
    "q70_semantic_dedup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val kept = Similarity.semanticDedup(e, "label", SemDedupThreshold)
        .groupBy("label").agg(count(lit(1)).as("n_kept"))
      e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        .join(kept, Seq("label"), "left")
        .na.fill(0L, Seq("n_kept"))
        .orderBy("label")
    }),

    // The 100 TB semantic-dedup path: hyperplane-bucket blocking instead
    // of label blocking — deterministic, so oracle-exact too.
    "q70a_semantic_dedup_lsh" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val kept = Similarity.semanticDedupLsh(e, SemDedupThreshold,
          nPlanes = SemLshPlanes)
        .groupBy("label").agg(count(lit(1)).as("n_kept"))
      e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        .join(kept, Seq("label"), "left")
        .na.fill(0L, Seq("n_kept"))
        .orderBy("label")
    }))

  /** q70's cosine threshold — q38's value, where the fixture has pairs. */
  val SemDedupThreshold = 0.45

  /** q70a's hyperplane count — 3 planes (8 buckets) is the coarsest
    * blocking that still BINDS at sf0.01 (2 bucket-collision pairs
    * survive the cosine threshold), so the oracle exercises real
    * clustering, not the everything-kept trivial case.
    */
  val SemLshPlanes = 3

  /** q71's chunk-order packing key: doc_id · 2^20 + chunk_idx — a single
    * numeric layout order (chunk counts are far below 2^20; doc ids past
    * ~2^43 would need a wider encoding).
    */
  val ChunkOrdShift = 20

  /** q66's chunk geometry: window 32, stride 24 → 8-token overlap, and
    * the ~54-token fixture docs split into ≥2 chunks at every SF so the
    * oracle exercises both interior and short tail chunks.
    */
  val ChunkWindow = 32
  val ChunkStride = 24

  /** q68's stratum keep rates (sources beyond the map use the default). */
  val StratRates: Map[String, Double] = Map("src0" -> 0.5, "src1" -> 0.25)
  val StratDefault = 0.04

  /** q69's target mixture (fixture sources are uniform, so src0 binds —
    * rate 1.0 — and the rest downsample to 0.75 / 0.5 / 0.25).
    */
  val MixShares: Map[String, Double] =
    Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)

  /** q62*'s shared sides: clicks probe, purchases pre-aggregated to one
    * row per (user_id, ts) so the carried payload is deterministic.
    */
  private def asofSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("p_event"),
        max_by(col("value"), col("event_id")).as("p_value"))
    (clicks, purchases)
  }

  private val asofCtes =
    """c AS (SELECT user_id, event_id, ts FROM events
      |  WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, max(event_id) AS p_event,
      |    arg_max(value, event_id) AS p_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)""".stripMargin

  /** The q64 split CASE over an arbitrary key expression — same Knuth
    * hash and thresholds as [[Split.splitExpr]]/[[Sampling.idHash]].
    */
  private[graft] def splitCaseSql(keyExpr: String): String = {
    val m = Sampling.HashMod
    val h = s"(($keyExpr % $m) * 2654435761) % $m"
    val conds = Round4Queries.SplitWeights
      .zip(Split.thresholds(Round4Queries.SplitWeights))
    val cases = conds.init
      .map { case ((name, _), thr) => s"WHEN $h < $thr THEN '$name'" }
      .mkString(" ")
    s"CASE $cases ELSE '${conds.last._1._1}' END"
  }

  val oracleSql: Map[String, String] = Map(
    // Exact per-source quantiles (quantile_cont ≡ the value-domain
    // interp, the q11 idiom) + within_bound TRUE: the Spark side goes
    // hash-red the day a sketch boundary leaves its frozen window.
    "q58a_token_deciles_approx" -> {
      val blocks = (1 to 9).map { i =>
        s"""SELECT source, CAST($i AS INTEGER) AS bound_idx,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  round(quantile_cont(CAST(n_tokens AS DOUBLE), ${i / 10.0}), 4)
           |    AS q_exact,
           |  TRUE AS within_bound FROM t GROUP BY source""".stripMargin
      }
      s"""WITH t AS (SELECT source,
         |    CAST(len(${LlmQueries.tokSql}) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT * FROM (${blocks.mkString(" UNION ALL ")})
         |ORDER BY source, bound_idx""".stripMargin
    },

    "q62a_asof_strict" ->
      s"""WITH $asofCtes
         |SELECT c.user_id, c.event_id, c.ts, p.p_event, p.p_value
         |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts > p.ts
         |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q62b_asof_left" ->
      s"""WITH $asofCtes
         |SELECT c.user_id, c.event_id, c.ts, p.p_event, p.p_value
         |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
         |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q66_chunking" -> {
      val (w, s) = (ChunkWindow, ChunkStride)
      s"""WITH t AS (SELECT doc_id,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
         |c AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n,
         |    unnest(range(0, CAST(ceil(len(ws)::DOUBLE / $s) AS BIGINT))) AS ci
         |  FROM t WHERE len(ws) > 0)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
         |  CAST(least(n - ci * $s, $w) AS BIGINT) AS n_tokens,
         |  array_to_string(ws[ci * $s + 1 : least(ci * $s + $w, n)], ' ')
         |    AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    },

    "q67_incremental_dedup" -> {
      val mod = Round3Queries.BenchMod
      val fpSql = "md5(array_to_string(list_sort(list_distinct(" +
        "regexp_extract_all(lower(text), '[a-z0-9]+'))), ' '))"
      s"""WITH fp AS (SELECT doc_id, source, $fpSql AS f FROM documents),
         |ex AS (SELECT DISTINCT f FROM fp WHERE doc_id % $mod = 0),
         |inc AS (SELECT fp.doc_id, fp.source, fp.f,
         |    CASE WHEN ex.f IS NOT NULL THEN 1 ELSE 0 END AS known
         |  FROM fp LEFT JOIN ex ON fp.f = ex.f WHERE doc_id % $mod <> 0),
         |kept AS (SELECT source FROM (SELECT *, row_number() OVER
         |    (PARTITION BY f ORDER BY doc_id) AS rn FROM inc WHERE known = 0)
         |  WHERE rn = 1),
         |g1 AS (SELECT source, count(*) AS n_incoming,
         |    CAST(sum(known) AS BIGINT) AS n_dup_existing
         |  FROM inc GROUP BY source),
         |g2 AS (SELECT source, count(*) AS n_new_unique FROM kept GROUP BY source)
         |SELECT g1.source, n_incoming, n_dup_existing,
         |  CAST(coalesce(n_new_unique, 0) AS BIGINT) AS n_new_unique,
         |  n_incoming - n_dup_existing - coalesce(n_new_unique, 0) AS n_dup_within
         |FROM g1 LEFT JOIN g2 ON g1.source = g2.source
         |ORDER BY g1.source""".stripMargin
    },

    "q68_stratified_sample" -> {
      val m = Sampling.HashMod
      val h = s"((doc_id % $m) * 2654435761) % $m"
      val cases = StratRates.toSeq.sortBy(_._1)
        .map { case (g, r) => s"WHEN source = '$g' THEN ${(m * r).toLong}" }
        .mkString(" ")
      val thr = s"CASE $cases ELSE ${(m * StratDefault).toLong} END"
      s"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents WHERE $h < $thr
         |GROUP BY source ORDER BY source""".stripMargin
    },

    "q69_mixture_rebalance" -> {
      val m = Sampling.HashMod
      val h = s"((d.doc_id % $m) * 2654435761) % $m"
      val values = MixShares.toSeq.sortBy(_._1)
        .map { case (g, sh) => s"('$g', $sh)" }.mkString(", ")
      // the rate expression mirrors Mixture.rebalance's double arithmetic
      // term for term (share * t / n, then rate * HashMod) so IEEE
      // evaluation is bit-identical on both engines
      s"""WITH c AS (SELECT source, count(*)::DOUBLE AS n FROM documents
         |  GROUP BY source),
         |sh AS (SELECT * FROM (VALUES $values) AS t(source, share)),
         |j AS (SELECT c.source, n, share FROM c JOIN sh ON c.source = sh.source),
         |mt AS (SELECT min(n / share) AS t FROM j),
         |r AS (SELECT source, share * t / n AS rate FROM j, mt)
         |SELECT d.source, count(*) AS n_docs
         |FROM documents d JOIN r ON d.source = r.source
         |WHERE CAST($h AS DOUBLE) < rate * $m
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    },

    // q51's prep CTEs + q66's chunk CTEs + q65's pack window, end to end.
    "q71_corpus_pipeline" -> {
      val (w, st) = (ChunkWindow, ChunkStride)
      val budget = Round4Queries.ShardBudgetTokens
      val stopList = TextOps.Stopwords.map(x => s"'$x'").mkString("[", ",", "]")
      s"""WITH n AS (SELECT doc_id, source,
         |    trim(regexp_replace(regexp_replace(text, 'https?://\\S+', '', 'g'),
         |      '\\s+', ' ', 'g')) AS nt
         |  FROM documents),
         |t AS (SELECT doc_id, source, nt,
         |    regexp_extract_all(lower(nt), '[a-z0-9]+') AS ws FROM n),
         |q AS (SELECT doc_id, source, ws,
         |  round((least(len(ws)::DOUBLE / 50.0, 1.0)
         |    + least((CASE WHEN len(ws) = 0 THEN 0.0 ELSE
         |        len(list_filter(ws, x -> list_contains($stopList, x)))::DOUBLE / len(ws) END) * 5.0, 1.0)
         |    + greatest(1.0 - (CASE WHEN length(nt) = 0 THEN 0.0 ELSE
         |        len(regexp_extract_all(nt, '[^a-zA-Z0-9\\s]'))::DOUBLE / length(nt) END) * 10.0, 0.0)
         |  ) / 3.0, 4) AS quality,
         |  md5(array_to_string(list_sort(list_distinct(ws)), ' ')) AS f
         |  FROM t),
         |p AS (SELECT * FROM q WHERE quality >= 0.5),
         |k AS (SELECT f, min(doc_id) AS keep FROM p GROUP BY f),
         |kept AS (SELECT p.doc_id, p.source, p.ws
         |  FROM p JOIN k ON p.doc_id = k.keep),
         |c AS (SELECT doc_id, source, CAST(len(ws) AS BIGINT) AS nn,
         |    unnest(range(0, CAST(ceil(len(ws)::DOUBLE / $st) AS BIGINT))) AS ci
         |  FROM kept WHERE len(ws) > 0),
         |ch AS (SELECT source,
         |    CAST(least(nn - ci * $st, $w) AS BIGINT) AS n_tokens,
         |    doc_id * ${1L << ChunkOrdShift} + ci AS ord FROM c),
         |sh AS (SELECT source, n_tokens,
         |    CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY ord
         |      ROWS UNBOUNDED PRECEDING) - n_tokens) / $budget) AS BIGINT) AS shard
         |  FROM ch)
         |SELECT source, shard, count(*) AS n_chunks,
         |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |FROM sh GROUP BY source, shard ORDER BY source, shard""".stripMargin
    },

    // q37's bucket CTEs as the blocking key + the q70 closure.
    "q70a_semantic_dedup_lsh" -> {
      val planeRows = for (p <- 0 until SemLshPlanes; j <- 0 until 64)
        yield s"($p, ${j + 1}, ${Similarity.planeWeight(p, j)}.0)"
      val planes = s"(VALUES ${planeRows.mkString(", ")}) AS planes(p, j, w)"
      s"""WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |d AS (SELECT vec_id, p, sum(v[j] * w) AS dot
         |  FROM e, $planes GROUP BY vec_id, p),
         |bk AS (SELECT vec_id, CAST(sum(CASE WHEN dot >= 0
         |    THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM d GROUP BY vec_id),
         |eb AS (SELECT e.vec_id, e.v, bk.bucket
         |  FROM e JOIN bk ON e.vec_id = bk.vec_id),
         |pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= $SemDedupThreshold),
         |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pr
         |  UNION SELECT vec_b, vec_a FROM pr),
         |r AS (SELECT DISTINCT src AS id, src AS lab FROM edges
         |  UNION SELECT e2.src, r.lab FROM edges e2 JOIN r ON e2.dst = r.id),
         |cc AS (SELECT id, min(lab) AS cluster FROM r GROUP BY id),
         |k AS (SELECT e.label,
         |    (cc.cluster IS NULL OR cc.cluster = e.vec_id) AS keep
         |  FROM e LEFT JOIN cc ON e.vec_id = cc.id)
         |SELECT label, count(*) AS n_vecs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM k GROUP BY label ORDER BY label""".stripMargin
    },

    // q38's pair predicate + the q50-style recursive-CTE closure; kept =
    // cluster minimum (or self when never paired).
    "q70_semantic_dedup" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= $SemDedupThreshold),
         |edges AS (SELECT vec_a AS src, vec_b AS dst FROM p
         |  UNION SELECT vec_b, vec_a FROM p),
         |r AS (SELECT DISTINCT src AS id, src AS lab FROM edges
         |  UNION SELECT e2.src, r.lab FROM edges e2 JOIN r ON e2.dst = r.id),
         |cc AS (SELECT id, min(lab) AS cluster FROM r GROUP BY id),
         |k AS (SELECT e.label,
         |    (cc.cluster IS NULL OR cc.cluster = e.vec_id) AS keep
         |  FROM e LEFT JOIN cc ON e.vec_id = cc.id)
         |SELECT label, count(*) AS n_vecs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM k GROUP BY label ORDER BY label""".stripMargin,

    // CC over the verified MinHash pairs (q50's recursive CTE), then the
    // q64 hash CASE keyed by coalesce(cluster, doc_id).
    "q64a_split_leakage_safe" ->
      s"""WITH RECURSIVE ${LlmQueries.minhashPairsCtes},
         |pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |r AS (SELECT DISTINCT src AS id, src AS lab FROM edges
         |  UNION SELECT e.src, r.lab FROM edges e JOIN r ON e.dst = r.id),
         |cc AS (SELECT id, min(lab) AS cluster FROM r GROUP BY id),
         |d AS (SELECT d.source, coalesce(cc.cluster, d.doc_id) AS k
         |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id),
         |s AS (SELECT source, ${splitCaseSql("k")} AS split FROM d)
         |SELECT split, source, count(*) AS n_docs FROM s
         |GROUP BY split, source ORDER BY split, source""".stripMargin)
}
