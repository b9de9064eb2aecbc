package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Collocations, CorpusStats, Decontaminate, EmbeddingDrift, Retrieval}

/** Round-5 additions, part four — the retrieval/query side of the corpus
  * engine plus two drift monitors: BM25 ranking (q83), PMI collocation
  * mining (q84), hybrid lexical+vector reciprocal-rank fusion (q85),
  * embedding-space (semantic) decontamination (q86, the paraphrase-leak
  * complement of q52's shingle overlap), per-source token-distribution
  * KL drift (q87), and embedding-centroid snapshot drift (q88).
  *
  * Oracle conventions as in [[LlmQueries]]. The BM25 double arithmetic
  * is parenthesized TERM-FOR-TERM identically on both engines and each
  * per-term score is rounded to integer micro-points before the
  * per-(query,doc) sum, so summation order cannot flip a bit.
  */
object Round5dQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Fixed query workload: terms drawn from the fixture vocabulary so
    * every query matches a deep candidate pool at every SF.
    */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("window", "sort", "merge"),
    3 -> Seq("vector", "scan"))

  /** q85's vector probes: each query also carries a probe embedding
    * (doc ids and vec ids share the fixture id space).
    */
  val HybridSpecs: Seq[(Int, Seq[String], Long)] =
    Bm25Queries.zip(Seq(0L, 1L, 2L)).map { case ((q, ts), p) => (q, ts, p) }

  val Bm25K = 10
  val RrfPool = 20

  /** q86's eval-set carve-out (vec_id % 97 = 0 ≈ 1%) and threshold —
    * 0.35 flags 9 of 494 corpus vectors at the sf0.01 gate, with the
    * nearest cosine 0.004 away from the cut (no cross-engine boundary
    * risk).
    */
  val EvalMod = 97L
  val SemanticTau = 0.35

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 top-10 per query: two corpus-sized stat aggregates + broadcast
    // query join + TopKBy — no corpus-sized window, no text shuffle.
    "q83_bm25" -> ((s, dir) =>
      Retrieval.bm25TopK(docs(s, dir), Bm25Queries, Bm25K)
        .orderBy("query_id", "rank")),

    // Top-100 PMI collocations (count floor scales with corpus size).
    "q84_collocations" -> ((s, dir) =>
      Collocations.pmiTop(docs(s, dir), 100)),

    // Hybrid retrieval: BM25 ∪ cosine top-20 pools fused by
    // rrf = Σ 1/(60+rank); the ranking window's input is ≤40 rows/query.
    "q85_hybrid_rrf" -> ((s, dir) =>
      Retrieval.hybridTopK(docs(s, dir), embs(s, dir), HybridSpecs,
        Bm25K, RrfPool)
        .orderBy("query_id", "rank")),

    // Semantic decontamination per label: corpus scans once against the
    // broadcast eval set; vectors never shuffle.
    "q86_semantic_decon" -> ((s, dir) => {
      val e = embs(s, dir)
      Decontaminate.semanticReport(
        e.filter(col("vec_id") % EvalMod =!= 0),
        e.filter(col("vec_id") % EvalMod === 0),
        SemanticTau)
    }),

    // Per-source KL from the corpus blend: integer nano-nat sums, so
    // the vocabulary-sized Σ is order-independent and oracle-exact.
    "q87_token_kl" -> ((s, dir) =>
      CorpusStats.tokenKlReport(docs(s, dir))),

    // Embedding drift between two snapshot slices (vec_id % 5 carves
    // overlapping-but-different 80% subsets): per-label centroid cosine
    // and norm ratio.
    "q88_embedding_drift" -> ((s, dir) => {
      val e = embs(s, dir)
      EmbeddingDrift.report(
        e.filter(col("vec_id") % 5 =!= 0),
        e.filter(col("vec_id") % 5 =!= 1))
    }),

    // Bloom-pruned fact join: the selective dimension slice (urgent
    // orders, ~20%) blooms; lineitem is membership-tested at the SCAN
    // before its join exchange. Oracle = the plain join (bloom is
    // conservative; false positives die in the real join).
    "q90_bloom_join" -> ((s, dir) => {
      val sel = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      val fact = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_extendedprice"),
          col("l_discount"))
      operators.BloomJoin.prunedInnerJoin(fact, sel, Seq("k"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("cnt"))
    }),

    // Weighted sampling (Efraimidis-Spirakis, weight = token count):
    // scan-stage exponential keys + TakeOrdered top-k.
    "q91_weighted_sample" -> ((s, dir) =>
      operators.Sampling.weightedSample(
        docs(s, dir).select(col("doc_id"),
          operators.TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "n_tokens", 100)),

    // Temperature-flattened mixture at α=0.5 (sqrt — the IEEE-exact
    // power), reported per source. Rates derive from the data inside
    // the plan; the filter is the scan-stage hash predicate.
    "q89_temperature_mixture" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept = operators.Mixture.temperatureRebalance(d, "source", 0.5)
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      d.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(kept, Seq("source"), "left")
        .na.fill(0L, Seq("n_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          round(col("n_kept") / col("n_docs"), 4).as("kept_share"))
        .orderBy("source")
    }))

  private val tokSql = LlmQueries.tokSql

  // ts.distinct mirrors Retrieval.bm25Scores — a repeated query term
  // must not double-count in either engine
  private val qValuesSql = Bm25Queries
    .flatMap { case (q, ts) => ts.distinct.map(t => s"($q, '$t')") }.mkString(", ")

  private val pqValuesSql = HybridSpecs
    .map { case (q, _, p) => s"($q, $p)" }.mkString(", ")

  /** Non-distinct adjacent bigrams (duplicates kept — PMI counts
    * occurrences), mirroring [[graft.functions.WordNgramsAll]].
    */
  private val bigramsAllSql =
    "CASE WHEN len(ws) < 2 THEN []::VARCHAR[] ELSE " +
      "list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END"

  /** The BM25 CTE chain shared by q83 and q85: per-term micro-point
    * scores (identical double parenthesization to
    * [[graft.operators.Retrieval.bm25Scores]]) → integer sum → rank.
    */
  private val bm25Ctes =
    s"""q(query_id, term) AS (VALUES $qValuesSql),
       |t AS (SELECT doc_id, $tokSql AS ws FROM documents),
       |st AS (SELECT count(*)::DOUBLE AS n,
       |    sum(len(ws))::DOUBLE / count(*) AS avgdl FROM t),
       |tfx AS (SELECT doc_id, dl, term, count(*) AS tf FROM (
       |    SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM t)
       |  GROUP BY doc_id, dl, term),
       |dfx AS (SELECT term, count(*) AS df FROM tfx GROUP BY term),
       |sc AS (SELECT q.query_id, tfx.doc_id,
       |    CAST(round(ln(((st.n - df + 0.5) / (df + 0.5)) + 1.0)
       |      * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / st.avgdl)))
       |      * 1000000.0) AS BIGINT) AS s
       |  FROM tfx JOIN q USING (term) JOIN dfx USING (term), st),
       |ag AS (SELECT query_id, doc_id,
       |    CAST(sum(s) AS BIGINT) AS score_micro FROM sc
       |  GROUP BY query_id, doc_id),
       |br AS (SELECT query_id, doc_id, score_micro,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank FROM ag)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q83_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT query_id, rank, doc_id, score_micro FROM br
         |WHERE rank <= $Bm25K ORDER BY query_id, rank""".stripMargin,

    "q84_collocations" ->
      s"""WITH t AS (SELECT doc_id, $tokSql AS ws FROM documents),
         |uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(ws) AS w FROM t)
         |  GROUP BY w),
         |bg AS (SELECT unnest($bigramsAllSql) AS g FROM t),
         |pair AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
         |    count(*) AS n_pair FROM bg GROUP BY 1, 2),
         |st AS (SELECT (SELECT sum(c1)::DOUBLE FROM uni) AS t,
         |    (SELECT sum(n_pair)::DOUBLE FROM pair) AS b,
         |    (SELECT greatest(${Collocations.FloorMin},
         |      CAST(sum(n_pair) AS BIGINT) // ${Collocations.FloorDiv})
         |      FROM pair) AS m),
         |sc AS (SELECT p.w1, p.w2, p.n_pair,
         |    round(ln(((p.n_pair::DOUBLE * st.t) * st.t)
         |      / ((st.b * ua.c1) * ub.c1)), 4) AS pmi
         |  FROM pair p JOIN uni ua ON p.w1 = ua.w
         |    JOIN uni ub ON p.w2 = ub.w, st
         |  WHERE p.n_pair >= st.m)
         |SELECT w1, w2, n_pair, pmi FROM sc
         |ORDER BY n_pair DESC, w1, w2 LIMIT 100""".stripMargin,

    "q85_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         |l AS (SELECT query_id, doc_id, rank AS lex_rank FROM br
         |  WHERE rank <= $RrfPool),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |pq(query_id, probe_id) AS (VALUES $pqValuesSql),
         |qe AS (SELECT pq.query_id, pq.probe_id, e.v AS qv
         |  FROM pq JOIN e ON e.vec_id = pq.probe_id),
         |vs AS (SELECT qe.query_id, e.vec_id AS doc_id,
         |    round(list_cosine_similarity(qv, v), 4) AS cs
         |  FROM qe JOIN e ON e.vec_id <> qe.probe_id),
         |vr AS (SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cs DESC, doc_id) AS INTEGER) AS vec_rank FROM vs),
         |v2 AS (SELECT * FROM vr WHERE vec_rank <= $RrfPool),
         |f AS (SELECT coalesce(l.query_id, v2.query_id) AS query_id,
         |    coalesce(l.doc_id, v2.doc_id) AS doc_id, lex_rank, vec_rank
         |  FROM l FULL OUTER JOIN v2
         |    ON l.query_id = v2.query_id AND l.doc_id = v2.doc_id),
         |g AS (SELECT query_id, doc_id, lex_rank, vec_rank,
         |    coalesce(1.0 / (60 + lex_rank), 0.0)
         |      + coalesce(1.0 / (60 + vec_rank), 0.0) AS rrf FROM f),
         |r2 AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank FROM g)
         |SELECT query_id, rank, doc_id, round(rrf, 6) AS rrf,
         |  lex_rank, vec_rank
         |FROM r2 WHERE rank <= $Bm25K ORDER BY query_id, rank""".stripMargin,

    "q86_semantic_decon" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |ev AS (SELECT v AS evv FROM e WHERE vec_id % $EvalMod = 0),
         |c AS (SELECT vec_id, label, v FROM e WHERE vec_id % $EvalMod <> 0),
         |f AS (SELECT c.vec_id, c.label,
         |    max(CASE WHEN ev.evv IS NOT NULL THEN 1 ELSE 0 END) AS contam
         |  FROM c LEFT JOIN ev
         |    ON round(list_cosine_similarity(c.v, ev.evv), 4) >= $SemanticTau
         |  GROUP BY c.vec_id, c.label)
         |SELECT label, count(*) AS n_total,
         |  CAST(sum(contam) AS BIGINT) AS n_contaminated,
         |  CAST(count(*) - sum(contam) AS BIGINT) AS n_kept
         |FROM f GROUP BY label ORDER BY label""".stripMargin,

    // per-term contribution rounded to nano-nats BEFORE the sum — the
    // identical double expression on both engines feeds CAST(round(...))
    "q87_token_kl" ->
      s"""WITH tk AS (SELECT source AS g, unnest($tokSql) AS w FROM documents),
         |sc AS (SELECT g, w, count(*) AS c FROM tk GROUP BY g, w),
         |corpus AS (SELECT w, sum(c) AS ca FROM sc GROUP BY w),
         |tot AS (SELECT g, sum(c) AS t FROM sc GROUP BY g),
         |gr AS (SELECT sum(t) AS grand FROM tot),
         |n AS (SELECT sc.g, tot.t,
         |    CAST(round(((c / t) * ln((c / t) / (ca / gr.grand)))
         |      * 1000000000.0) AS BIGINT) AS nano
         |  FROM sc JOIN corpus USING (w) JOIN tot ON sc.g = tot.g, gr)
         |SELECT g AS source, count(*) AS n_terms,
         |  CAST(t AS BIGINT) AS n_tokens,
         |  round(sum(nano) / 1000000000.0, 6) AS kl
         |FROM n GROUP BY g, t ORDER BY source""".stripMargin,

    // range(1, 65) = the fixture's 64 embedding dims (FIXTURES.md; same
    // constant as q49's oracle) — the OPERATOR is dimension-agnostic,
    // only this oracle pins the fixture geometry. The centroid cosine
    // is double arithmetic whose combine order differs per engine; the
    // 4-dp round absorbs it (ulp-scale error vs 1e-4 resolution — same
    // accepted trade as q49's avg_centroid_cos).
    "q88_embedding_drift" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |o AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
        |nw AS (SELECT * FROM e WHERE vec_id % 5 <> 1),
        |po AS (SELECT label, pos, avg(v[pos]) AS mo
        |  FROM o, (SELECT unnest(range(1, 65)) AS pos) p GROUP BY label, pos),
        |pn AS (SELECT label, pos, avg(v[pos]) AS mn
        |  FROM nw, (SELECT unnest(range(1, 65)) AS pos) p GROUP BY label, pos),
        |g AS (SELECT po.label,
        |    round(sum(mo * mn) / (sqrt(sum(mo * mo)) * sqrt(sum(mn * mn))), 4)
        |      AS centroid_cos,
        |    round(sqrt(sum(mn * mn)) / sqrt(sum(mo * mo)), 4) AS norm_ratio
        |  FROM po JOIN pn ON po.label = pn.label AND po.pos = pn.pos
        |  GROUP BY po.label),
        |co AS (SELECT label, count(*) AS n_old FROM o GROUP BY label),
        |cn AS (SELECT label, count(*) AS n_new FROM nw GROUP BY label)
        |SELECT g.label, n_old, n_new, centroid_cos, norm_ratio
        |FROM g JOIN co ON g.label = co.label JOIN cn ON g.label = cn.label
        |ORDER BY g.label""".stripMargin,

    "q90_bloom_join" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS cnt
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,

    // u = (idHash+1)/(HashMod+1) in (0,1]; key = -ln(u)/w quantized to
    // integer micro-points; id tiebreak makes the cut a total order
    "q91_weighted_sample" -> {
      val hashSql = s"((doc_id % ${operators.Sampling.HashMod}) * 2654435761) " +
        s"% ${operators.Sampling.HashMod}"
      s"""WITH t AS (SELECT doc_id, len($tokSql) AS n_tokens FROM documents),
         |w AS (SELECT doc_id, n_tokens FROM t WHERE n_tokens > 0),
         |k AS (SELECT doc_id, n_tokens,
         |    CAST(round((-ln((($hashSql) + 1) / ${operators.Sampling.HashMod + 1L})
         |      / n_tokens) * 1000000.0) AS BIGINT) AS key_micro
         |  FROM w)
         |SELECT doc_id, n_tokens, key_micro FROM k
         |ORDER BY key_micro, doc_id LIMIT 100""".stripMargin
    },

    // weights quantized to integer micro-points before the normalizing
    // sum (order-independent); α=0.5 via sqrt — correctly rounded IEEE,
    // so shares/rates are bit-identical cross-engine
    "q89_temperature_mixture" -> {
      val hashSql = s"((doc_id % ${operators.Sampling.HashMod}) * 2654435761) " +
        s"% ${operators.Sampling.HashMod}"
      s"""WITH c AS (SELECT source, count(*)::DOUBLE AS n FROM documents
         |  GROUP BY source),
         |w AS (SELECT source, n,
         |    CAST(round(sqrt(n) * 1000000.0) AS BIGINT) AS wq FROM c),
         |sw AS (SELECT CAST(sum(wq) AS BIGINT) AS s FROM w),
         |sh AS (SELECT source, n, wq / sw.s AS share FROM w, sw),
         |t AS (SELECT min(n / share) AS t FROM sh),
         |r AS (SELECT source, n, ((share * t.t) / n) AS rate FROM sh, t),
         |k AS (SELECT d.source, count(*) AS n_kept
         |  FROM documents d JOIN r ON d.source = r.source
         |  WHERE ($hashSql) < rate * ${operators.Sampling.HashMod}
         |  GROUP BY d.source)
         |SELECT r.source, CAST(r.n AS BIGINT) AS n_docs,
         |  coalesce(k.n_kept, 0) AS n_kept,
         |  round(coalesce(k.n_kept, 0) / r.n, 4) AS kept_share
         |FROM r LEFT JOIN k ON r.source = k.source
         |ORDER BY r.source""".stripMargin
    })
}
