package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CorpusStats, Dedup}

/** Round-8 part three: winnowing fingerprints (the MOSS selector) and
  * Kneser–Ney bigram scoring.
  */
object Round8cQueries {

  val WinnowK = 3
  val WinnowWindow = 4
  val KnDiscountPct = 75

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Winnowing fingerprint census: guaranteed-coverage near-dup
    // fingerprints at ~2/(w+1) shingle density; shared_ppm is the
    // cross-doc contamination signal.
    "q226_winnowing" -> ((s, dir) =>
      Dedup.winnowingReport(Tables.load(s, dir, "documents"),
        WinnowK, WinnowWindow)),

    // Interpolated Kneser–Ney bigram NLL: continuation-probability
    // backoff — the stronger fluency filter over q174's JM mixture.
    "q227_kneser_ney" -> ((s, dir) =>
      CorpusStats.bigramKnNll(Tables.load(s, dir, "documents"),
        KnDiscountPct)))

  val oracleSql: Map[String, String] = Map(
    "q226_winnowing" -> {
      val k = WinnowK; val w = WinnowWindow
      s"""WITH tk AS (SELECT doc_id,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         |  FROM documents),
         |g AS (SELECT doc_id, CAST(len(t) - ${k - 1} AS BIGINT)
         |      AS n_grams, CAST(i - 1 AS INTEGER) AS pos,
         |    array_to_string(t[i:i + ${k - 1}], ' ') AS g
         |  FROM (SELECT doc_id, t,
         |      unnest(range(1, len(t) - ${k - 2})) AS i
         |    FROM tk WHERE len(t) >= $k)),
         |ky AS (SELECT doc_id, n_grams, pos,
         |    g || chr(1) || lpad(CAST(100000000 - pos AS VARCHAR), 9,
         |      '0') AS skey
         |  FROM g),
         |sw AS (SELECT doc_id, n_grams, pos,
         |    min(skey) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel
         |  FROM ky),
         |sel AS (SELECT DISTINCT doc_id, n_grams,
         |    split_part(sel, chr(1), 1) AS fp
         |  FROM sw WHERE pos <= greatest(n_grams - $w, 0)),
         |cs AS (SELECT fp, count(DISTINCT doc_id) AS n_docs_with
         |  FROM sel GROUP BY 1)
         |SELECT sel.doc_id, sel.n_grams,
         |  CAST(count(*) AS BIGINT) AS n_fingerprints,
         |  CAST(sum(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_shared,
         |  CAST((sum(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END)
         |    * 1000000) // count(*) AS BIGINT) AS shared_ppm
         |FROM sel JOIN cs ON cs.fp = sel.fp
         |GROUP BY 1, 2 ORDER BY sel.doc_id""".stripMargin
    },

    "q227_kneser_ney" -> {
      val d = KnDiscountPct / 100.0
      s"""WITH tk AS (SELECT doc_id,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         |  FROM documents),
         |inst AS (SELECT doc_id, t[i] AS p, t[i + 1] AS w
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |    FROM tk WHERE len(t) >= 2)),
         |bi AS (SELECT p, w, CAST(count(*) AS BIGINT) AS f_pw FROM inst
         |  GROUP BY 1, 2),
         |up AS (SELECT p, CAST(sum(f_pw) AS BIGINT) AS f_p,
         |    CAST(count(*) AS BIGINT) AS n1_fwd FROM bi GROUP BY 1),
         |uw AS (SELECT w, CAST(count(*) AS BIGINT) AS n1_back FROM bi
         |  GROUP BY 1),
         |ty AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bi),
         |st AS (SELECT bi.p, bi.w, f_pw, f_p, n1_fwd, n1_back, n_types
         |  FROM bi JOIN up ON up.p = bi.p JOIN uw ON uw.w = bi.w, ty),
         |pd AS (SELECT inst.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(CAST(round(-ln((f_pw - $d) / f_p +
         |      $d * n1_fwd / f_p * (n1_back / n_types)) * 1e9)
         |      AS BIGINT)) AS BIGINT) AS s
         |  FROM inst JOIN st ON st.p = inst.p AND st.w = inst.w
         |  GROUP BY 1)
         |SELECT d.doc_id, d.source,
         |  CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CASE WHEN pd.n_bigrams > 0 THEN CAST(pd.s // pd.n_bigrams
         |    AS BIGINT) END AS kn_nll_nano
         |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    })
}
