package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, QualityModel}

/** Round-6 part eighteen: Flesch readability, interpolated bigram NLL
  * (the gibberish filter that catches common-word salad), and the
  * vocabulary coverage curve (tokenizer budget sizing).
  */
object Round6qQueries {

  /** q175 budgets — the fixture vocabulary is 31 tokens, so the curve
    * BINDS at every step and the 50 budget exercises the
    * above-vocabulary clamp.
    */
  val CoverageBudgets: Seq[Int] = Seq(2, 5, 10, 20, 50)

  val BigramLambdaPct = 75

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q173_readability" -> ((s, dir) =>
      QualityModel.readability(Tables.load(s, dir, "documents"))),

    "q174_bigram_nll" -> ((s, dir) =>
      CorpusStats.bigramNll(Tables.load(s, dir, "documents"),
        BigramLambdaPct)),

    "q175_vocab_coverage" -> ((s, dir) =>
      CorpusStats.vocabCoverageCurve(Tables.load(s, dir, "documents"),
        CoverageBudgets)))

  val oracleSql: Map[String, String] = Map(
    "q173_readability" ->
      """WITH b AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_words,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, source, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN round(206.835 -
        |    1.015 * (n_words / n_sentences) -
        |    84.6 * (n_syllables / n_words), 4) END AS flesch
        |FROM b ORDER BY doc_id""".stripMargin,

    "q174_bigram_nll" -> {
      val lam = BigramLambdaPct / 100.0
      s"""WITH tk AS (SELECT doc_id,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         |  FROM documents),
         |inst AS (SELECT doc_id, t[i] AS p, t[i + 1] AS w
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |    FROM tk WHERE len(t) >= 2)),
         |bi AS (SELECT p, w, CAST(count(*) AS BIGINT) AS f_pw FROM inst
         |  GROUP BY 1, 2),
         |up AS (SELECT p, CAST(count(*) AS BIGINT) AS f_p FROM inst
         |  GROUP BY 1),
         |uw AS (SELECT w, CAST(count(*) AS BIGINT) AS f_w FROM inst
         |  GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM inst),
         |st AS (SELECT bi.p, bi.w, f_pw, f_p, f_w, n_all FROM bi
         |  JOIN up ON up.p = bi.p JOIN uw ON uw.w = bi.w, nn),
         |pd AS (SELECT inst.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(CAST(round(-ln($lam * (f_pw / f_p) +
         |      ${1.0 - lam} * (f_w / n_all)) * 1e9) AS BIGINT))
         |      AS BIGINT) AS s
         |  FROM inst JOIN st ON st.p = inst.p AND st.w = inst.w
         |  GROUP BY 1)
         |SELECT d.doc_id, d.source,
         |  CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CASE WHEN pd.n_bigrams > 0 THEN CAST(pd.s // pd.n_bigrams
         |    AS BIGINT) END AS nll_nano
         |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "q175_vocab_coverage" -> {
      val budgets = CoverageBudgets.sorted.mkString("[", ", ", "]")
      s"""WITH c AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM
         |    (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
         |      AS w FROM documents) GROUP BY 1),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
         |    CAST(count(*) AS BIGINT) AS n_vocab_total FROM c),
         |r AS (SELECT *,
         |    CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT)
         |      AS rank,
         |    CAST(sum(c) OVER (ORDER BY c DESC, w
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum FROM c),
         |b AS (SELECT unnest($budgets) AS vocab_size)
         |SELECT b.vocab_size, t.n_vocab_total, r.cum AS covered,
         |  t.total_tokens,
         |  CAST((r.cum * 1000000) // t.total_tokens AS BIGINT)
         |    AS coverage_ppm
         |FROM b, t JOIN r ON r.rank = least(b.vocab_size, t.n_vocab_total)
         |ORDER BY b.vocab_size""".stripMargin
    })
}
