package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Evaluation, TextOps}

/** Round-7 part twenty: Good–Turing missing mass and Cohen's κ. */
object Round7zQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // How much probability mass lives in tokens each source has never
    // seen — the vocab/LM-planning number.
    "q224_good_turing" -> ((s, dir) =>
      CorpusStats.goodTuringReport(Tables.load(s, dir, "documents"))),

    // Chance-corrected agreement between the labeled language and the
    // n-gram language-ID prediction (the q31 confusion matrix's single
    // honest number).
    "q225_cohens_kappa" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("lang"),
          TextOps.predictedLang(col("text")).as("predicted"))
      Evaluation.cohensKappa(docs, "lang", "predicted")
    }))

  val oracleSql: Map[String, String] = Map(
    "q224_good_turing" ->
      s"""WITH tk AS (SELECT source AS slice,
         |    unnest(${LlmQueries.tokSql}) AS w FROM documents),
         |cen AS (SELECT slice, w, CAST(count(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |s AS (SELECT slice, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_vocab,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_singletons
         |  FROM cen GROUP BY 1)
         |SELECT slice AS source, n_tokens, n_vocab, n_singletons,
         |  CAST((n_singletons * 1000000) // n_tokens AS BIGINT)
         |    AS unseen_mass_ppm,
         |  CAST((n_singletons * 1000000) // n_vocab AS BIGINT)
         |    AS singleton_vocab_ppm
         |FROM s ORDER BY source""".stripMargin,

    "q225_cohens_kappa" -> {
      val hits = TextOps.LangMarkers.map { case (code, ms) =>
        s"${LlmQueries.langHitSql(ms)} AS h_$code"
      }.mkString(", ")
      val codes = TextOps.LangMarkers.map(_._1)
      val greatest = s"greatest(${codes.map(c => s"h_$c").mkString(", ")})"
      val caseChain = codes.map(c =>
        s"WHEN h_$c = $greatest THEN '$c'").mkString(" ")
      s"""WITH s AS (SELECT lang, $hits FROM documents),
         |p AS (SELECT lang AS a, CASE WHEN $greatest = 0 THEN 'und'
         |    $caseChain END AS b FROM s),
         |cen AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM p
         |  GROUP BY 1, 2),
         |ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM cen
         |  GROUP BY 1),
         |mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cen
         |  GROUP BY 1),
         |ch AS (SELECT CAST(sum(CAST(ra AS HUGEINT) * cb) AS HUGEINT)
         |    AS pe_num FROM ma JOIN mb ON ma.a = mb.b),
         |bs AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
         |      AS n_agree FROM cen)
         |SELECT n, n_agree,
         |  CAST((n_agree * 1000000) // n AS BIGINT) AS agree_ppm,
         |  CASE WHEN CAST(n AS HUGEINT) * n <> coalesce(pe_num, 0) THEN
         |    round((n_agree::DOUBLE * n - coalesce(pe_num, 0)::DOUBLE) /
         |      (n::DOUBLE * n - coalesce(pe_num, 0)::DOUBLE), 6) END
         |    AS kappa
         |FROM bs, ch""".stripMargin
    })
}
