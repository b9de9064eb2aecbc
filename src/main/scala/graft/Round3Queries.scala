package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Repetition, Sampling, Scrub, TextOps}

/** Round-3 corpus-prep queries (q52-q58): benchmark decontamination,
  * within-doc repetition stats, deterministic quota sampling, corpus
  * mixture report, global top tokens, PII scrubbing, token-length
  * deciles. Oracle conventions as in [[LlmQueries]]: identical aliases,
  * identical rounding, deterministic total ORDER BY on both sides.
  */
object Round3Queries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** doc_id % BenchMod == 0 plays the held-out benchmark set. */
  val BenchMod = 17L
  val ContaminationThreshold = 0.5
  val QuotaK = 5
  val MaxTopNgramFrac = 0.2
  val AnnQueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)
  val AnnK = 5
  /** 16 deterministic codebook/centroid ids, present at every SF. */
  val PqCodebookIds: Seq[Long] = (0 until 16).map(_.toLong * 7)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: bigram containment of each corpus doc
    // in the (broadcast) benchmark shingle vocabulary, per-source report.
    "q52_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Decontaminate.report(
        d.filter(col("doc_id") % BenchMod =!= 0),
        d.filter(col("doc_id") % BenchMod === 0),
        "source", ContaminationThreshold)
    }),

    // Gopher-style repetition stats: duplicate-token fraction and
    // top-bigram occupancy, rolled up per source.
    "q53_repetition" -> ((s, dir) =>
      Repetition.report(docs(s, dir), "source", MaxTopNgramFrac)),

    // Deterministic per-source quota sample (hash-rank top-k): the
    // corpus-mixing "cap any one domain" rule, reproducible on any engine.
    "q54_quota_sample" -> ((s, dir) =>
      Sampling.quotaSample(docs(s, dir), "source", QuotaK)
        .select("source", "rank", "doc_id")
        .orderBy("source", "rank")),

    // Corpus mixture report: (source, lang) doc/token counts + each
    // cell's share of all tokens — the dataset-card composition table.
    // The grand total joins back via a broadcast single-row aggregate;
    // cardinality after the first agg is bounded by |sources|x|langs|.
    "q55_mixture" -> ((s, dir) => {
      val m = docs(s, dir)
        .select(col("source"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"))
      val tot = m.agg(sum("total_tokens").cast("double").as("t"))
      m.crossJoin(broadcast(tot))
        .select(col("source"), col("lang"), col("n_docs"), col("total_tokens"),
          round(col("total_tokens") / col("t"), 6).as("token_share"))
        .orderBy("source", "lang")
    }),

    // Global token frequency top-20 (exact word-count: partial aggs +
    // TakeOrderedAndProject; ties broken by token for determinism).
    "q56_top_tokens" -> ((s, dir) =>
      graft.util.Parallelism.ensure(docs(s, dir))
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(20)),

    // PII scrub report: per-rule match totals + clean-doc counts. (The
    // fixture corpus is digit-/@-free so totals are 0 there — the rule
    // behavior itself is pinned by ScrubSpec on synthetic PII rows; this
    // query exercises the full scan-stage scrub plan and its oracle.)
    "q57_pii_scrub" -> ((s, dir) => Scrub.report(docs(s, dir), "source")),

    // Product-quantization ADC top-k: the memory-scale ANN path (8-byte
    // codes, broadcast codebook + query tables, integer distances so
    // every rank is exact across engines). Codebook ids are the fixed
    // deterministic subset (training = ProductQuantization.train, spec'd
    // separately — same stub convention as IVF's q42).
    "q60_ann_pq" -> ((s, dir) =>
      graft.operators.ProductQuantization.adcTopK(
        Tables.load(s, dir, "embeddings"), AnnQueryIds, AnnK, PqCodebookIds)
        .orderBy("query_id", "rank")),

    // Exact per-group top-k via the native TopKBy TypedImperativeAggregate
    // (partial aggregation keeps <=k rows per group per partition before
    // the shuffle — no per-group sort of all rows, O(k) memory per heap;
    // the window twin is the oracle). Top-3 orders per customer.
    "q59_group_topn" -> ((s, dir) => {
      import graft.functions.TopKBy.topKBy
      val ordered = struct(col("o_totalprice"), (-col("o_orderkey")).as("neg_key"))
      Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(topKBy(ordered, 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("o_custkey"), (col("pos") + 1).cast("int").as("rank"),
          (-col("t.neg_key")).as("o_orderkey"),
          col("t.o_totalprice").as("o_totalprice"))
        .orderBy("o_custkey", "rank")
    }),

    // Token-length deciles per source, exact path: ntile over
    // (n_tokens, doc_id) — bit-exact for the oracle; decile edges are
    // exact integer math on both engines. NB the window partitions on
    // the low-cardinality source key — fine at the gate SF, serial per
    // source at 100 TB; q58a (Round5Queries) is the scale-safe approx
    // axis of the same operator.
    "q58_token_deciles" -> ((s, dir) =>
      graft.operators.Deciles.report(
        docs(s, dir)
          .select(col("source"), col("doc_id"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "n_tokens", "doc_id", exact = true)))

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  private val bigramsSql =
    "CASE WHEN len(ws) < 2 THEN []::VARCHAR[] ELSE " +
      "list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) END"

  /** Non-distinct bigram occurrences (repetition counting). */
  private val bigramsAllSql =
    "CASE WHEN len(ws) < 2 THEN []::VARCHAR[] ELSE " +
      "list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END"

  // reduce-then-multiply, mirroring Sampling.idHash's overflow-safe form
  private val idHashSql =
    s"((doc_id % ${Sampling.HashMod}) * 2654435761) % ${Sampling.HashMod}"

  val oracleSql: Map[String, String] = Map(
    "q52_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, source, $tokSql AS ws FROM documents),
         |sh AS (SELECT doc_id, source, $bigramsSql AS sh FROM t),
         |bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh
         |  WHERE doc_id % $BenchMod = 0),
         |corp AS (SELECT doc_id, unnest(sh) AS s FROM sh
         |  WHERE doc_id % $BenchMod <> 0),
         |pd AS (SELECT doc_id, count(*) AS n_sh,
         |    sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS hits
         |  FROM corp LEFT JOIN bench b USING (s) GROUP BY doc_id),
         |f AS (SELECT d.source,
         |    CASE WHEN coalesce(n_sh, 0) = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(round(hits * 10000.0 / n_sh) AS BIGINT) END AS bp
         |  FROM (SELECT doc_id, source FROM documents
         |        WHERE doc_id % $BenchMod <> 0) d
         |  LEFT JOIN pd USING (doc_id))
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN bp >= ${(ContaminationThreshold * 10000).toLong}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS contaminated_docs,
         |  round(sum(bp) / (count(*) * 10000.0), 4) AS avg_overlap
         |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q53_repetition" ->
      s"""WITH t AS (SELECT doc_id, source, $tokSql AS ws FROM documents),
         |g AS (SELECT doc_id, source,
         |  CASE WHEN len(ws) = 0 THEN 0.0
         |    ELSE round(1.0 - len(list_distinct(ws))::DOUBLE / len(ws), 4)
         |  END AS token_rep,
         |  $bigramsAllSql AS bg FROM t),
         |d AS (SELECT source, token_rep,
         |  CASE WHEN len(bg) = 0 THEN 0.0
         |    ELSE round(list_max(list_transform(list_distinct(bg),
         |      x -> len(list_filter(bg, y -> y = x))))::DOUBLE / len(bg), 4)
         |  END AS top_frac FROM g)
         |SELECT source, count(*) AS n_docs,
         |  round(sum(CAST(round(token_rep * 10000, 0) AS BIGINT))
         |    / (count(*) * 10000.0), 4) AS avg_token_rep,
         |  round(sum(CAST(round(top_frac * 10000, 0) AS BIGINT))
         |    / (count(*) * 10000.0), 4) AS avg_top_ngram_frac,
         |  CAST(sum(CASE WHEN top_frac > $MaxTopNgramFrac THEN 1 ELSE 0 END)
         |    AS BIGINT) AS would_drop
         |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "q54_quota_sample" ->
      s"""WITH r AS (SELECT source, doc_id,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY $idHashSql ASC, doc_id ASC) AS INTEGER) AS rank
         |  FROM documents)
         |SELECT source, rank, doc_id FROM r WHERE rank <= $QuotaK
         |ORDER BY source, rank""".stripMargin,

    "q55_mixture" ->
      s"""WITH m AS (SELECT source, lang, count(*) AS n_docs,
         |    CAST(sum(len($tokSql)) AS BIGINT) AS total_tokens
         |  FROM documents GROUP BY source, lang),
         |tot AS (SELECT sum(total_tokens)::DOUBLE AS t FROM m)
         |SELECT source, lang, n_docs, total_tokens,
         |  round(total_tokens / t, 6) AS token_share
         |FROM m, tot ORDER BY source, lang""".stripMargin,

    "q56_top_tokens" ->
      s"""SELECT token, count(*) AS cnt
         |FROM (SELECT unnest($tokSql) AS token FROM documents)
         |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,

    "q57_pii_scrub" -> {
      val countSqls = Scrub.Rules.map { case (name, pat, _) =>
        s"CAST(sum(len(regexp_extract_all(text, '$pat'))) AS BIGINT) AS total_$name"
      }
      val anyPii = Scrub.Rules
        .map { case (_, pat, _) => s"len(regexp_extract_all(text, '$pat'))" }
        .mkString(" + ")
      val scrubbed = Scrub.Rules.foldLeft("text") { case (t, (_, pat, repl)) =>
        s"regexp_replace($t, '$pat', '$repl', 'g')"
      }
      s"""SELECT source, count(*) AS n_docs,
         |  ${countSqls.mkString(",\n  ")},
         |  CAST(sum(CASE WHEN $anyPii = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS clean_docs,
         |  CAST(sum(length(text) - length($scrubbed)) AS BIGINT)
         |    AS chars_delta
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
    },

    "q60_ann_pq" -> {
      val cbValues = PqCodebookIds.zipWithIndex
        .map { case (v, i) => s"($v, $i)" }.mkString(", ")
      val qids = AnnQueryIds.mkString("(", ", ", ")")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |sn AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS sv,
         |    list_dot_product(v[m*8+1 : m*8+8], v[m*8+1 : m*8+8]) AS n2
         |  FROM e, ms),
         |cb0 AS (SELECT * FROM (VALUES $cbValues) AS t(cvid, cid)),
         |cb AS (SELECT cb0.cid, sn.m, sn.sv AS cv, sn.n2 AS cn2
         |  FROM cb0 JOIN sn ON sn.vec_id = cb0.cvid),
         |d AS (SELECT s.vec_id, s.m, c.cid,
         |    CAST(round((s.n2 + c.cn2 - 2*list_dot_product(s.sv, c.cv)) * 1e6)
         |      AS BIGINT) AS d2i
         |  FROM sn s JOIN cb c ON s.m = c.m),
         |enc AS (SELECT vec_id, m, cid AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2i, cid) AS rn FROM d) WHERE rn = 1),
         |adist AS (SELECT dq.vec_id AS query_id, ex.vec_id, sum(dq.d2i) AS ai
         |  FROM d dq JOIN enc ex ON dq.m = ex.m AND dq.cid = ex.code
         |  WHERE dq.vec_id IN $qids AND ex.vec_id <> dq.vec_id
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, vec_id, round(ai / 1e6, 4) AS approx_d2,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY ai ASC, vec_id ASC) AS INTEGER) AS rank
         |  FROM adist)
         |SELECT query_id, vec_id, approx_d2, rank FROM r WHERE rank <= $AnnK
         |ORDER BY query_id, rank""".stripMargin
    },

    "q59_group_topn" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank
        |  FROM orders)
        |SELECT o_custkey, rank, o_orderkey, o_totalprice FROM r
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,

    "q58_token_deciles" ->
      s"""WITH t AS (SELECT source, doc_id,
         |    CAST(len($tokSql) AS BIGINT) AS n_tokens FROM documents),
         |d AS (SELECT source, n_tokens,
         |    CAST(ntile(10) OVER (PARTITION BY source
         |      ORDER BY n_tokens ASC, doc_id ASC) AS INTEGER) AS decile
         |  FROM t)
         |SELECT source, decile, count(*) AS n_docs,
         |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
         |FROM d GROUP BY source, decile ORDER BY source, decile""".stripMargin)
}
