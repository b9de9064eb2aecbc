package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.SpanDedup

/** Round-9 part two: exact duplicated-SPAN detection and removal
  * (ExactSubstr-style, Lee et al. 2022) — the substring-level dedup the
  * document-level family (MinHash/SimHash/fingerprint) can't express:
  * boilerplate runs INSIDE otherwise-distinct documents. All position
  * algebra is exact integers; the oracle replays the window census,
  * canonical-first rule, and island merge verbatim.
  */
object Round9dQueries {

  /** Window length in tokens — frozen so the census, the oracle, and
    * the spec all cut at the same run length. */
  val SpanL = 8

  private def docs(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Which docs carry duplicated runs, and how much of each doc is a
    // copy: per-doc maximal-span report.
    "q264_dup_spans" -> ((s, dir) =>
      SpanDedup.docReport(docs(s, dir), SpanL)),

    // The corpus-health rollup per source.
    "q265_span_dedup_report" -> ((s, dir) =>
      SpanDedup.report(docs(s, dir), "source", SpanL)),

    // Span REMOVAL: every doc's kept-token count + the exact rolling
    // hash of the scrubbed token sequence (the re-ingest fingerprint).
    "q266_span_scrub" -> ((s, dir) =>
      SpanDedup.scrub(docs(s, dir), SpanL)),

    // Span-level benchmark DECONTAMINATION: corpus spans that appear
    // verbatim in the held-out benchmark slice (q52's doc_id % 17
    // split) — the removal-grade complement of q52's doc-level overlap.
    "q270_span_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      SpanDedup.decontReport(
        d.filter(col("doc_id") % Round3Queries.BenchMod =!= 0),
        d.filter(col("doc_id") % Round3Queries.BenchMod === 0),
        "source", SpanL)
    }),

    // The SCAN-STAGE tier of q270: the benchmark's window hashes ride
    // the plan as one literal array and every doc folds once — no
    // explode, no join, no shuffle; streaming-safe. Same oracle as
    // q270 (differential pair by construction).
    "q271_span_decon_scan" -> ((s, dir) => {
      val d = docs(s, dir)
      SpanDedup.decontReportScan(
        d.filter(col("doc_id") % Round3Queries.BenchMod =!= 0),
        d.filter(col("doc_id") % Round3Queries.BenchMod === 0),
        "source", SpanL)
    }))

  /** Shared CTE chain: tokens → positioned window hashes → census with
    * the canonical-first rule → flagged extras → island-merged spans.
    */
  private def spanCtes: String = {
    val l = SpanL
    val win = s"array_to_string(list_slice(ws, i, i + ${l - 1}), ' ')"
    s"""t AS (SELECT doc_id, source,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
       |  FROM documents),
       |wi AS (SELECT doc_id, ws,
       |    unnest(range(1, len(ws) - $l + 2)) AS i
       |  FROM t WHERE len(ws) >= $l),
       |wh AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |    ${LlmQueries.rollSql(win)} AS h
       |  FROM wi),
       |cen AS (SELECT h, count(*) AS c, min(doc_id) AS fd
       |  FROM wh GROUP BY h),
       |fp AS (SELECT wh.h, min(wh.pos) AS fpos
       |  FROM wh JOIN cen ON cen.h = wh.h AND wh.doc_id = cen.fd
       |  WHERE cen.c >= 2 GROUP BY wh.h),
       |ex AS (SELECT wh.doc_id, wh.pos
       |  FROM wh JOIN cen ON cen.h = wh.h JOIN fp ON fp.h = wh.h
       |  WHERE cen.c >= 2
       |    AND (wh.doc_id <> cen.fd OR wh.pos <> fp.fpos)),
       |isl AS (SELECT doc_id, pos, max(pos) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1
       |    PRECEDING) AS prev_max FROM ex),
       |isl2 AS (SELECT *, CASE WHEN prev_max IS NULL OR
       |    pos > prev_max + $l THEN 1 ELSE 0 END AS ns FROM isl),
       |isl3 AS (SELECT *, sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
       |  FROM isl2),
       |sp AS (SELECT doc_id, span_id, CAST(min(pos) AS INTEGER)
       |    AS span_start, CAST(max(pos) + $l AS INTEGER) AS span_end,
       |    CAST(count(*) AS BIGINT) AS n_windows
       |  FROM isl3 GROUP BY 1, 2)""".stripMargin
  }

  /** Shared by q270 (join tier) and q271 (scan tier): the two
    * implementations are value-identical by construction, so one oracle
    * doubles as a standing differential test between them.
    */
  private def decontOracle: String = {
    val l = SpanL
    val win = s"array_to_string(list_slice(ws, i, i + ${l - 1}), ' ')"
    s"""WITH t AS (SELECT doc_id, source,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
       |  FROM documents),
       |wi AS (SELECT doc_id, ws,
       |    unnest(range(1, len(ws) - $l + 2)) AS i
       |  FROM t WHERE len(ws) >= $l),
       |wh AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |    ${LlmQueries.rollSql(win)} AS h
       |  FROM wi),
       |rw AS (SELECT DISTINCT h FROM wh
       |  WHERE doc_id % ${Round3Queries.BenchMod} = 0),
       |ex AS (SELECT wh.doc_id, wh.pos FROM wh JOIN rw ON rw.h = wh.h
       |  WHERE wh.doc_id % ${Round3Queries.BenchMod} <> 0),
       |isl AS (SELECT doc_id, pos, max(pos) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1
       |    PRECEDING) AS prev_max FROM ex),
       |isl2 AS (SELECT *, CASE WHEN prev_max IS NULL OR
       |    pos > prev_max + $l THEN 1 ELSE 0 END AS ns FROM isl),
       |isl3 AS (SELECT *, sum(ns) OVER (PARTITION BY doc_id ORDER BY
       |    pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS span_id FROM isl2),
       |sp AS (SELECT doc_id, span_id, CAST(min(pos) AS INTEGER)
       |    AS span_start, CAST(max(pos) + $l AS INTEGER) AS span_end
       |  FROM isl3 GROUP BY 1, 2),
       |pd AS (SELECT doc_id,
       |    CAST(sum(span_end - span_start) AS BIGINT) AS bad_tokens
       |  FROM sp GROUP BY 1)
       |SELECT t.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN pd.bad_tokens IS NOT NULL THEN 1 ELSE 0
       |    END) AS BIGINT) AS docs_contaminated,
       |  CAST(sum(len(t.ws)) AS BIGINT) AS total_tokens,
       |  CAST(sum(coalesce(pd.bad_tokens, 0)) AS BIGINT)
       |    AS contaminated_tokens,
       |  (CAST(sum(coalesce(pd.bad_tokens, 0)) AS BIGINT) * 1000000)
       |    // CAST(sum(len(t.ws)) AS BIGINT) AS contaminated_ppm
       |FROM t LEFT JOIN pd ON pd.doc_id = t.doc_id
       |WHERE t.doc_id % ${Round3Queries.BenchMod} <> 0
       |GROUP BY t.source ORDER BY t.source""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q264_dup_spans" ->
      s"""WITH $spanCtes,
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(n_windows) AS BIGINT) AS dup_windows,
         |    CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens
         |  FROM sp GROUP BY 1)
         |SELECT pd.doc_id, CAST(len(t.ws) AS BIGINT) AS n_tokens,
         |  pd.n_spans, pd.dup_windows, pd.dup_tokens,
         |  (pd.dup_tokens * 1000000) // len(t.ws) AS dup_ppm
         |FROM pd JOIN t ON t.doc_id = pd.doc_id
         |ORDER BY pd.doc_id""".stripMargin,

    "q265_span_dedup_report" ->
      s"""WITH $spanCtes,
         |pd AS (SELECT doc_id,
         |    CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens
         |  FROM sp GROUP BY 1)
         |SELECT t.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN pd.dup_tokens IS NOT NULL THEN 1 ELSE 0
         |    END) AS BIGINT) AS docs_flagged,
         |  CAST(sum(len(t.ws)) AS BIGINT) AS total_tokens,
         |  CAST(sum(coalesce(pd.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
         |  (CAST(sum(coalesce(pd.dup_tokens, 0)) AS BIGINT) * 1000000)
         |    // CAST(sum(len(t.ws)) AS BIGINT) AS dup_ppm
         |FROM t LEFT JOIN pd ON pd.doc_id = t.doc_id
         |GROUP BY t.source ORDER BY t.source""".stripMargin,

    "q270_span_decontaminate" -> decontOracle,
    // the scan-stage tier is value-identical by construction — the two
    // implementations (census join vs literal-array fold) share one
    // oracle, making the pair a standing differential test
    "q271_span_decon_scan" -> decontOracle,

    "q266_span_scrub" -> {
      val keptHash = LlmQueries.rollSql(
        "array_to_string(list(tok ORDER BY i), ' ')")
      s"""WITH $spanCtes,
         |ti AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS idx
         |  FROM t),
         |tw AS (SELECT doc_id, CAST(idx - 1 AS INTEGER) AS p,
         |    ws[idx] AS tok
         |  FROM ti),
         |kept AS (SELECT tw.doc_id, tw.p AS i, tw.tok FROM tw
         |  WHERE NOT EXISTS (SELECT 1 FROM sp
         |    WHERE sp.doc_id = tw.doc_id AND tw.p >= sp.span_start
         |      AND tw.p < sp.span_end)),
         |kh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         |    $keptHash AS kept_hash
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.ws) AS BIGINT) AS n_tokens,
         |  coalesce(kh.kept_tokens, 0) AS kept_tokens,
         |  coalesce(kh.kept_hash, 0) AS kept_hash
         |FROM t LEFT JOIN kh ON kh.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin
    })
}
