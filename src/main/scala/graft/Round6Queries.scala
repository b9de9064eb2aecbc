package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, Multimodal}

/** Round-6 additions: the stop-shingle skew caps, oracled where they
  * BIND (the q61a pattern — a deliberately tight cap at the gate SF
  * proves the CAPPED path matches the oracle, not just the uncapped
  * exact tier).
  *
  * q97a is [[Dedup.containmentPairs]] with `maxShingleDocs` — the cap
  * round-5's verdict named as the one remaining scale hazard (a
  * boilerplate shingle in d docs fans out d²/2 join rows; capped,
  * per-key fan-out is bounded while denominators stay exact). q76a is
  * [[CorpusStats.sourceOverlap]] with `maxShingleSources` — same
  * stop-shingle move on the source-overlap matrix for wide-S catalogs.
  *
  * Both caps only ever REMOVE intersection evidence, so capped scores
  * are ≤ uncapped and capped survivors ⊆ uncapped survivors
  * (spec-pinned in Round6Spec).
  */
object Round6Queries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** q97a's stop-shingle doc-frequency cap. At sf0.01 the (lang, shingle)
    * df distribution tops out at 28 with 856 of 4473 keys above 8, so 8
    * BINDS hard (it is NOT the production value — production would sit
    * at the boilerplate knee, e.g. 10⁴ — it is the tightest cap that
    * still leaves the gate result non-trivial).
    */
  val ContainmentShingleCap = 8L

  /** q76a's stop-shingle source-frequency cap. The sf0.01 fixture has 20
    * sources and 35 of 916 distinct bigrams present in >18 of them —
    * exactly the ubiquitous-boilerplate band the cap exists to drop.
    */
  val OverlapSourceCap = 18L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Capped containment pairs: same one-explode shingle equi-join as
    // q97, minus shingles in > cap docs of the block. The hot-set
    // relation is tiny and broadcasts; per-key join fan-out is bounded
    // by cap²/2.
    "q97a_containment_capped" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), "lang", Round5eQueries.ContainmentTau,
        maxShingleDocs = Some(ContainmentShingleCap))
        .orderBy("doc_a", "doc_b")),

    // Capped source-overlap matrix: ubiquitous shingles leave the
    // intersection join; n_a/n_b stay exact from the uncapped relation.
    "q76a_source_overlap_capped" -> ((s, dir) =>
      CorpusStats.sourceOverlap(docs(s, dir),
        maxShingleSources = Some(OverlapSourceCap))
        .orderBy("source_a", "source_b")),

    // REAL audio metadata: each doc's bytes wrapped into a genuine
    // RIFF/WAVE container (channels/rate varied by doc_id), then parsed
    // back by the chunk-walking header parser. The oracle recomputes
    // every field in closed form from (doc_id, byte length) — so the
    // parser is checked against independent arithmetic, not itself.
    "q119_audio_metadata" -> ((s, dir) =>
      Multimodal.audioMetadata(
        Multimodal.synthesizeWavPayloads(docs(s, dir)))
        .orderBy("doc_id")))

  val oracleSql: Map[String, String] = Map(
    "q97a_containment_capped" -> {
      val tok = LlmQueries.tokSql
      val roll = LlmQueries.rollSql("s")
      s"""WITH t AS (SELECT doc_id, lang, $tok AS ws FROM documents),
         |bg0 AS (SELECT doc_id, lang, ${LlmQueries.bigramsSql} AS sg FROM t),
         |bg AS (SELECT doc_id, lang,
         |  list_distinct(list_transform(sg, s -> $roll)) AS sh FROM bg0),
         |ex AS (SELECT doc_id, lang, unnest(sh) AS h FROM bg),
         |hot AS (SELECT lang, h FROM ex GROUP BY lang, h
         |  HAVING count(*) > $ContainmentShingleCap),
         |exc AS (SELECT e.doc_id, e.lang, e.h FROM ex e
         |  WHERE NOT EXISTS (SELECT 1 FROM hot x
         |    WHERE x.lang = e.lang AND x.h = e.h)),
         |sz AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter
         |  FROM exc a JOIN exc b ON a.lang = b.lang AND a.h = b.h
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |c AS (SELECT doc_a, doc_b, inter,
         |    round(inter::DOUBLE / x.sz, 4) AS cont_a,
         |    round(inter::DOUBLE / y.sz, 4) AS cont_b
         |  FROM p JOIN sz x ON p.doc_a = x.doc_id
         |    JOIN sz y ON p.doc_b = y.doc_id)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter, cont_a, cont_b
         |FROM c WHERE greatest(cont_a, cont_b) >= ${Round5eQueries.ContainmentTau}
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q76a_source_overlap_capped" -> {
      val tok = LlmQueries.tokSql
      val big = LlmQueries.bigramsSql
      s"""WITH t AS (SELECT source, $tok AS ws FROM documents),
         |sh AS (SELECT DISTINCT source, s FROM
         |  (SELECT source, unnest($big) AS s FROM t)),
         |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
         |hot AS (SELECT s FROM sh GROUP BY s
         |  HAVING count(*) > $OverlapSourceCap),
         |shc AS (SELECT sh.source, sh.s FROM sh
         |  WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.s = sh.s)),
         |iv AS (SELECT a.source AS sa, b.source AS sb, count(*) AS c
         |  FROM shc a JOIN shc b ON a.s = b.s AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT x.source AS source_a, y.source AS source_b,
         |  x.n AS n_a, y.n AS n_b,
         |  CAST(coalesce(iv.c, 0) AS BIGINT) AS n_common,
         |  round(coalesce(iv.c, 0)::DOUBLE / (x.n + y.n - coalesce(iv.c, 0)), 4)
         |    AS jaccard
         |FROM sz x JOIN sz y ON x.source < y.source
         |LEFT JOIN iv ON iv.sa = x.source AND iv.sb = y.source
         |ORDER BY source_a, source_b""".stripMargin
    },

    // WAV synthesis parameters in closed form: channels = 1 + id%2,
    // rate = 8000 + (id%3)*4000, 16-bit PCM, data truncated to whole
    // frames ⇒ n_frames = floor(utf8_bytes / (channels*2)).
    "q119_audio_metadata" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |    octet_length(encode(text)) AS nb
        |  FROM documents)
        |SELECT doc_id, channels, sample_rate,
        |  CAST(16 AS INTEGER) AS bits_per_sample,
        |  CAST(nb // (channels * 2) AS BIGINT) AS n_frames,
        |  CAST((nb // (channels * 2)) * 1000 // sample_rate AS BIGINT)
        |    AS duration_ms
        |FROM p ORDER BY doc_id""".stripMargin)
}
