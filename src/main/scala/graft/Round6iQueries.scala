package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, Evaluation}

/** Round-6 part ten: passage-level duplication (the C4 sub-document
  * granularity), precision/recall threshold sweep, and the Zipf-law
  * token-distribution fit.
  */
object Round6iQueries {

  val PassageWords = 10
  val ZipfVocab = 200

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-doc verbatim-passage sharing: scan-stage slicing, one
    // passage-keyed census, co-keyed join back.
    "q155_passage_dedup" -> ((s, dir) =>
      Dedup.passageDupStats(docs(s, dir), PassageWords)),

    // One PR point per distinct threshold off the score histogram —
    // the cutoff-picking sweep behind the q132 AUC single number.
    "q156_pr_curve" -> ((s, dir) =>
      Evaluation.prCurve(docs(s, dir), "n_chars", col("lang") === "en")),

    // ln-ln OLS over the top-200 token census (TakeOrdered, no global
    // sort); integer nano product cells, slope at 6 dp.
    "q157_zipf" -> ((s, dir) =>
      CorpusStats.zipfFit(docs(s, dir), ZipfVocab)))

  val oracleSql: Map[String, String] = Map(
    "q155_passage_dedup" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |ch AS (SELECT doc_id, CAST((i - 1) // $PassageWords AS INT)
         |      AS cidx,
         |    string_agg(w, ' ' ORDER BY i) AS passage
         |  FROM (SELECT doc_id, unnest(ws) AS w,
         |      generate_subscripts(ws, 1) AS i FROM tk)
         |  GROUP BY 1, 2),
         |cs AS (SELECT passage, count(DISTINCT doc_id) AS nd
         |  FROM ch GROUP BY passage)
         |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_passages,
         |  CAST(sum(CASE WHEN cs.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_shared_passages,
         |  CAST((sum(CASE WHEN cs.nd >= 2 THEN 1 ELSE 0 END) * 10000)
         |    // count(*) AS BIGINT) AS shared_bp
         |FROM ch JOIN cs USING (passage)
         |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin,

    "q156_pr_curve" ->
      """WITH h AS (SELECT CAST(n_chars AS BIGINT) AS s,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
        |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
        |  FROM documents GROUP BY 1),
        |w AS (SELECT *,
        |    sum(pos) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |    sum(neg) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
        |    sum(pos) OVER () AS p_all FROM h)
        |SELECT s AS threshold, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp, CAST(p_all - tp AS BIGINT) AS fn,
        |  CAST((tp * 1000000) // (tp + fp) AS BIGINT) AS precision_ppm,
        |  CAST((tp * 1000000) // p_all AS BIGINT) AS recall_ppm
        |FROM w ORDER BY threshold DESC""".stripMargin,

    "q157_zipf" ->
      s"""WITH c AS (SELECT token AS w, count(*) AS c FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
         |      AS token FROM documents) GROUP BY 1
         |  ORDER BY c DESC, w ASC LIMIT $ZipfVocab),
         |r AS (SELECT *, row_number() OVER (ORDER BY c DESC, w ASC)
         |    AS rank FROM c),
         |k AS (SELECT *,
         |    CAST(round(ln(rank::DOUBLE) * 1e9) AS BIGINT) AS x_nano,
         |    CAST(round(ln(c::DOUBLE) * 1e9) AS BIGINT) AS y_nano,
         |    CAST(round(ln(rank::DOUBLE) * ln(rank::DOUBLE) * 1e9)
         |      AS BIGINT) AS xx_nano,
         |    CAST(round(ln(rank::DOUBLE) * ln(c::DOUBLE) * 1e9)
         |      AS BIGINT) AS xy_nano FROM r),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(c) AS BIGINT) AS total_count,
         |    CAST(sum(x_nano) AS BIGINT) AS sx_nano,
         |    CAST(sum(y_nano) AS BIGINT) AS sy_nano,
         |    CAST(sum(xx_nano) AS BIGINT) AS sxx_nano,
         |    CAST(sum(xy_nano) AS BIGINT) AS sxy_nano FROM k)
         |SELECT n_tokens, total_count, sx_nano, sy_nano, sxx_nano,
         |  sxy_nano,
         |  round((n_tokens::DOUBLE * sxy_nano / 1e9 -
         |      (sx_nano::DOUBLE / 1e9) * (sy_nano::DOUBLE / 1e9)) /
         |    (n_tokens::DOUBLE * sxx_nano / 1e9 -
         |      (sx_nano::DOUBLE / 1e9) * (sx_nano::DOUBLE / 1e9)), 6)
         |    AS zipf_slope
         |FROM s""".stripMargin)
}
