package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Diff, Dedup, QualityModel, Split}

/** Round-5 additions, part three: corpus snapshot diff (q79 — the
  * dataset-versioning churn report), hashed-feature linear quality
  * scoring (q80 — the classifier-based quality-filter stand-in), and
  * the split-leakage audit (q81 — near-dup pairs straddling train/eval
  * under the PLAIN hash split, the measurement that motivates q64a's
  * leakage-safe variant).
  *
  * Oracle conventions as in [[LlmQueries]]: identical aliases, integer
  * arithmetic until one final division, deterministic total ORDER BY on
  * both sides, and fixture slices chosen so every status/flag is
  * populated at the sf0.01 gate.
  */
object Round5cQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** q79's two synthetic corpus versions, derived from the one fixture
    * table by deterministic id predicates: the old version lacks the
    * docs the "refresh" added (id % 7 = 3), the new version dropped
    * id % 13 = 5 and re-extracted id % 11 = 0 with a trailing marker
    * (changed text). At sf0.01 all four statuses are populated.
    */
  def diffOld(d: DataFrame): DataFrame = d.filter(col("doc_id") % 7 =!= 3)
  def diffNew(d: DataFrame): DataFrame =
    d.filter(col("doc_id") % 13 =!= 5)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev")))
          .otherwise(col("text")))

  /** q80's keep threshold: mean pseudo-weight ≥ 0 (the model's scores
    * are roughly centered, so the cut separates ~half the fixture —
    * binding at every SF).
    */
  val QualityKeep = 0.0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Corpus snapshot diff: per-(source, status) churn counts between
    // two corpus versions. Each side reduces to (id, source, md5) before
    // ONE full-outer join on doc_id; text never shuffles.
    "q79_corpus_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      Diff.diffReport(diffOld(d), diffNew(d))
        .orderBy("source", "status")
    }),

    // Hashed-feature linear quality model: per-source mean score and
    // kept-count at the threshold. Scan-stage only (tokens → feature
    // hash → integer weight sum); per-doc scores are integer basis
    // points so the cross-engine comparison is exact.
    "q80_quality_model" -> ((s, dir) => {
      val d = docs(s, dir)
      d.withColumn("score_bp", QualityModel.scoreBp(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum("score_bp") / (count(lit(1)) * 10000.0), 4).as("avg_quality"),
          sum(when(col("score_bp") >= (QualityKeep * 10000).toLong, 1L)
            .otherwise(0L)).as("n_kept"))
        .orderBy("source")
    }),

    // Split-leakage audit: near-dup pairs straddling splits under the
    // PLAIN per-doc hash split (q64). Splits are recomputed per pair
    // endpoint by the scan-stage hash CASE — no join against the corpus.
    "q81_split_leakage" -> ((s, dir) =>
      Split.leakageReport(Dedup.minhashNearDups(docs(s, dir)),
        Round4Queries.SplitWeights)
        .orderBy("split_a", "split_b")),

    // Token-budget accounting, three ways: whitespace tokens, word
    // tokens, and BPE-ish pretokens (letter/digit/punctuation runs) —
    // the three counts a budgeting/packing stage reconciles. Pure scan
    // stage: three counters in one pass, one aggregate.
    "q82_token_accounting" -> ((s, dir) => {
      import graft.operators.TextOps
      docs(s, dir)
        .select(col("source"),
          TextOps.wsTokenCount(col("text")).cast("long").as("ws"),
          TextOps.tokenCount(col("text")).cast("long").as("words"),
          TextOps.bpeTokenCount(col("text")).cast("long").as("bpe"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("ws").as("ws_tokens"),
          sum("words").as("word_tokens"),
          sum("bpe").as("bpe_tokens"),
          round(sum("bpe") / count(lit(1)).cast("double"), 4)
            .as("avg_bpe_per_doc"))
        .orderBy("source")
    }))

  private val M = operators.TextOps.HashMod
  private val tokSql = LlmQueries.tokSql

  val oracleSql: Map[String, String] = Map(
    "q79_corpus_diff" ->
      s"""WITH oldv AS (SELECT doc_id, source, md5(text) AS ck FROM documents
         |  WHERE doc_id % 7 <> 3),
         |newv AS (SELECT doc_id, source,
         |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' rev' ELSE text END) AS ck
         |  FROM documents WHERE doc_id % 13 <> 5),
         |d AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         |    coalesce(n.source, o.source) AS source,
         |    CASE WHEN o.ck IS NULL THEN 'added'
         |         WHEN n.ck IS NULL THEN 'removed'
         |         WHEN o.ck <> n.ck THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id)
         |SELECT source, status, count(*) AS n_docs
         |FROM d GROUP BY source, status ORDER BY source, status""".stripMargin,

    "q80_quality_model" -> {
      val f = s"(${LlmQueries.rollSql("w")} % ${QualityModel.Dim})"
      val w = s"(((($f * ${QualityModel.Knuth}) % ${QualityModel.WMod}) % 2001) - 1000)"
      s"""WITH t AS (SELECT source, $tokSql AS ws FROM documents),
         |f AS (SELECT source, len(ws) AS n,
         |    list_sum(list_transform(ws, w -> $w)) AS total
         |  FROM t),
         |s AS (SELECT source,
         |    CASE WHEN n = 0 THEN 0
         |      ELSE CAST(round(total * 10.0 / n) AS BIGINT) END AS score_bp
         |  FROM f)
         |SELECT source, count(*) AS n_docs,
         |  round(sum(score_bp) / (count(*) * 10000.0), 4) AS avg_quality,
         |  CAST(sum(CASE WHEN score_bp >= ${(QualityKeep * 10000).toLong}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM s GROUP BY source ORDER BY source""".stripMargin
    },

    "q81_split_leakage" ->
      s"""WITH ${LlmQueries.minhashPairsCtes},
         |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
         |sp AS (SELECT ${Round5Queries.splitCaseSql("doc_a")} AS split_a,
         |    ${Round5Queries.splitCaseSql("doc_b")} AS split_b FROM p)
         |SELECT split_a, split_b, count(*) AS n_pairs,
         |  split_a <> split_b AS leaked
         |FROM sp GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin,

    "q82_token_accounting" ->
      s"""WITH t AS (SELECT source,
         |    len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\r\\f]+'),
         |      x -> len(x) > 0)) AS ws,
         |    len($tokSql) AS words,
         |    len(regexp_extract_all(text, '${operators.TextOps.BpePattern}')) AS bpe
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
         |  CAST(sum(words) AS BIGINT) AS word_tokens,
         |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         |  round(sum(bpe) / CAST(count(*) AS DOUBLE), 4) AS avg_bpe_per_doc
         |FROM t GROUP BY source ORDER BY source""".stripMargin)
}
