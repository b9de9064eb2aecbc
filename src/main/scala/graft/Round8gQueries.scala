package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Privacy, Relevance, TextOps}

/** Round-8 part seven: RAKE keyword extraction and the Laplace-noise
  * DP count release.
  */
object Round8gQueries {

  val RakeTopK = 40
  val DpEpsilonPermille = 1000L // epsilon = 1.0
  val DpSalt = 0L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multi-word keyword phrases by degree/frequency — what tf-idf's
    // unigram view misses.
    "q238_rake_keywords" -> ((s, dir) =>
      Relevance.rakeKeywords(Tables.load(s, dir, "documents"),
        RakeTopK)),

    // epsilon-DP event-type counts via the Laplace mechanism with
    // hash-deterministic noise (reproducible release; see scaladoc
    // for the production salt contract).
    "q239_dp_histogram" -> ((s, dir) =>
      Privacy.dpHistogram(Tables.load(s, dir, "events"), "event_type",
        DpEpsilonPermille, DpSalt)))

  val oracleSql: Map[String, String] = Map(
    "q238_rake_keywords" -> {
      val stops = TextOps.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH tk AS (SELECT doc_id,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         |  FROM documents),
         |w0 AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS w
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
         |    FROM tk)),
         |nz AS (SELECT doc_id, pos, w FROM w0
         |  WHERE w NOT IN ($stops)),
         |isl AS (SELECT doc_id, pos, w,
         |    pos - row_number() OVER (PARTITION BY doc_id
         |      ORDER BY pos) AS island
         |  FROM nz),
         |ph AS (SELECT doc_id, island,
         |    CAST(count(*) AS BIGINT) AS n_words,
         |    string_agg(w, ' ' ORDER BY pos) AS phrase
         |  FROM isl GROUP BY 1, 2),
         |wd AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(n_words) AS BIGINT) AS deg
         |  FROM (SELECT n_words, unnest(string_split(phrase, ' '))
         |      AS w FROM ph) GROUP BY 1),
         |sc AS (SELECT w, (deg * 1000000) // freq AS score_w FROM wd),
         |cs AS (SELECT phrase, n_words,
         |    CAST(count(*) AS BIGINT) AS n_occurrences
         |  FROM ph GROUP BY 1, 2)
         |SELECT x.phrase, x.n_words, x.n_occurrences,
         |  CAST(sum(score_w) AS BIGINT) AS score_micro
         |FROM (SELECT phrase, n_words, n_occurrences,
         |    unnest(string_split(phrase, ' ')) AS w FROM cs) x
         |  JOIN sc ON sc.w = x.w
         |GROUP BY 1, 2, 3
         |ORDER BY score_micro DESC, x.phrase
         |LIMIT $RakeTopK""".stripMargin
    },

    "q239_dp_histogram" -> {
      val mod = TextOps.HashMod
      val b = 1000.0 / DpEpsilonPermille
      val hs = LlmQueries.rollSql(s"key || '#$DpSalt'")
      s"""WITH c AS (SELECT event_type AS key,
         |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
         |h AS (SELECT key, n,
         |    ((($hs) % $mod + $mod) % $mod)::DOUBLE / $mod AS u
         |  FROM c),
         |l AS (SELECT key, n,
         |    CAST(round(-$b * sign(u - 0.5) *
         |      ln(1 - 2 * greatest(abs(u - 0.5) - 1.0 / $mod, 0)) *
         |      1e6) AS BIGINT) AS lap_micro
         |  FROM h)
         |SELECT key AS event_type, n, lap_micro,
         |  CAST(n + lap_micro // 1000000 AS BIGINT) AS n_released
         |FROM l ORDER BY event_type""".stripMargin
    })
}
