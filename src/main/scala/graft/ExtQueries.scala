package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relevance, Sessionize, Similarity, TextOps}
import graft.util.SkewJoin

/** Round-2 extension queries (q44-q47): sessionization, text
  * normalization, skew-safe salted join, configurable n-gram dedup.
  * Oracle conventions as in [[LlmQueries]]: identical aliases, identical
  * rounding, deterministic total ORDER BY on both sides.
  */
object ExtQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** 12 h gap: matches the fixture's event cadence (~3.6 h mean per-user
    * inter-event time), yielding multi-event sessions at every SF.
    */
  val SessionGapSeconds = 43200L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gap-based sessionization: one shuffle + one per-user sort; both
    // window functions share a single Window operator.
    "q44_sessions" -> ((s, dir) =>
      Sessionize.sessionSummary(Tables.load(s, dir, "events"), SessionGapSeconds)
        .orderBy("user_id", "session_idx")),

    // Normalization pass: URL strip + whitespace collapse, rolled up per
    // source so the oracle output is compact at every SF.
    "q45_normalize" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"),
          length(col("text")).as("raw_len"),
          length(TextOps.normalize(col("text"))).as("norm_len"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("raw_len").cast("long")).as("total_raw_chars"),
          sum(col("norm_len").cast("long")).as("total_norm_chars"),
          sum(when(col("norm_len") < col("raw_len"), 1L).otherwise(0L))
            .as("changed_docs"))
        .orderBy("source")),

    // The q04 join re-expressed through the salted-join pattern: results
    // must equal the plain join (the oracle IS the plain join), proving
    // the salt is semantics-free. Orientation per SkewJoin's cost model:
    // the skewed fact (lineitem, many rows per orderkey) is the salted
    // LEFT; the smaller orders relation is the replicated RIGHT — only
    // the small side pays the salts× replication through the exchange.
    // salts=4 here: lineitem:orders is ~4:1, so higher salt counts push
    // the replicated side PAST the fact size and the "small side pays"
    // premise stops holding — salt count is bounded by the size ratio.
    "q46_salted_join" -> ((s, dir) => {
      val joined = SkewJoin.saltedInnerJoin(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("k"), col("l_extendedprice"), col("l_discount")),
        Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .withColumnRenamed("o_orderkey", "k"),
        Seq("k"), salts = 4)
      joined.groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    }),

    // n-gram Jaccard at n=3: the configurable-shingle variant of q33.
    "q47_trigram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), "source", 0.3, ngram = 3)
        .orderBy("doc_a", "doc_b")),

    // TF-IDF keyword profile: top-5 terms per source by summed score.
    "q48_tfidf_terms" -> ((s, dir) =>
      Relevance.topTerms(docs(s, dir), "source", 5)
        .orderBy("block", "rank")),

    // Embedding cohesion per label: centroid + mean member→centroid cosine.
    "q49_label_profile" -> ((s, dir) =>
      Similarity.labelProfile(Tables.load(s, dir, "embeddings"))),

    // Duplicate clusters: connected components over the verified MinHash
    // near-dup pairs (min-label propagation; the keep-one-per-group
    // closure of pairwise dedup).
    "q50_dup_clusters" -> ((s, dir) =>
      Dedup.clusterSizes(Dedup.minhashNearDups(docs(s, dir)))
        .orderBy("cluster")),

    // The composed prep pipeline: normalize → quality-filter →
    // exact-dedup → per-source report, one declarative plan.
    "q51_prep_pipeline" -> ((s, dir) =>
      graft.operators.Pipeline.corpusReport(docs(s, dir), minQuality = 0.5)))

  private val tokSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  private val stopListSql =
    TextOps.Stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  private val trigramsSql =
    "CASE WHEN len(ws) < 3 THEN []::VARCHAR[] ELSE " +
      "list_distinct(list_transform(range(1, len(ws)-1), " +
      "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END"

  private def jaccardSql(a: String, b: String): String =
    s"CASE WHEN len(list_distinct($a || $b)) = 0 THEN 0.0 ELSE " +
      s"round(len(list_intersect($a, $b))::DOUBLE / len(list_distinct($a || $b)), 4) END"

  val oracleSql: Map[String, String] = Map(
    "q44_sessions" ->
      s"""WITH g AS (SELECT user_id, event_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |s AS (SELECT user_id, event_id, ts, value,
         |    CASE WHEN prev_ts IS NULL
         |      OR date_diff('second', prev_ts, ts) > $SessionGapSeconds
         |      THEN 1 ELSE 0 END AS new_s
         |  FROM g),
         |c AS (SELECT user_id, ts, value,
         |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM s)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |  date_diff('second', min(ts), max(ts)) AS duration_sec,
         |  round(sum(value), 2) AS sum_value
         |FROM c GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,

    "q45_normalize" ->
      """WITH n AS (SELECT source, length(text) AS raw_len,
        |    length(trim(regexp_replace(regexp_replace(text,
        |      'https?://\S+', '', 'g'), '\s+', ' ', 'g'))) AS norm_len
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(raw_len) AS BIGINT) AS total_raw_chars,
        |  CAST(sum(norm_len) AS BIGINT) AS total_norm_chars,
        |  CAST(sum(CASE WHEN norm_len < raw_len THEN 1 ELSE 0 END) AS BIGINT)
        |    AS changed_docs
        |FROM n GROUP BY source ORDER BY source""".stripMargin,

    "q46_salted_join" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS cnt
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // hashed shingle sets (list_distinct of the rolling hash), mirroring
    // the Spark side's HashedWordNgrams relation exactly
    "q47_trigram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, source, $tokSql AS ws FROM documents),
         |bg0 AS (SELECT doc_id, source, $trigramsSql AS sg FROM t),
         |bg AS (SELECT doc_id, source,
         |  list_distinct(list_transform(sg, s -> ${LlmQueries.rollSql("s")})) AS sh FROM bg0)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  ${jaccardSql("a.sh", "b.sh")} AS jaccard
         |FROM bg a JOIN bg b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE ${jaccardSql("a.sh", "b.sh")} >= 0.3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q48_tfidf_terms" ->
      s"""WITH tok AS (SELECT doc_id, source AS block, unnest($tokSql) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, block, term, count(*) AS tf
         |  FROM tok GROUP BY doc_id, block, term),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |sc AS (SELECT block, term,
         |    round(sum(tf * ln(n.n / df)), 4) AS score
         |  FROM tf JOIN dfx USING (term), n GROUP BY block, term),
         |r AS (SELECT block, term, score,
         |    CAST(row_number() OVER (PARTITION BY block
         |      ORDER BY score DESC, term) AS INTEGER) AS rank FROM sc)
         |SELECT block, term, score, rank FROM r WHERE rank <= 5
         |ORDER BY block, rank""".stripMargin,

    "q51_prep_pipeline" ->
      s"""WITH n AS (SELECT doc_id, source,
         |    trim(regexp_replace(regexp_replace(text, 'https?://\\S+', '', 'g'),
         |      '\\s+', ' ', 'g')) AS nt
         |  FROM documents),
         |t AS (SELECT doc_id, source, nt,
         |    regexp_extract_all(lower(nt), '[a-z0-9]+') AS ws FROM n),
         |q AS (SELECT doc_id, source, nt,
         |  round((least(len(ws)::DOUBLE / 50.0, 1.0)
         |    + least((CASE WHEN len(ws) = 0 THEN 0.0 ELSE
         |        len(list_filter(ws, w -> list_contains($stopListSql, w)))::DOUBLE / len(ws) END) * 5.0, 1.0)
         |    + greatest(1.0 - (CASE WHEN length(nt) = 0 THEN 0.0 ELSE
         |        len(regexp_extract_all(nt, '[^a-zA-Z0-9\\s]'))::DOUBLE / length(nt) END) * 10.0, 0.0)
         |  ) / 3.0, 4) AS quality,
         |  md5(array_to_string(list_sort(list_distinct(ws)), ' ')) AS f
         |  FROM t),
         |p AS (SELECT * FROM q WHERE quality >= 0.5),
         |k AS (SELECT f, min(doc_id) AS keep FROM p GROUP BY f),
         |kept AS (SELECT p.* FROM p JOIN k ON p.doc_id = k.keep),
         |ks AS (SELECT source, count(*) AS kept_docs,
         |    round(avg(quality), 4) AS avg_quality,
         |    CAST(sum(length(nt)) AS BIGINT) AS norm_chars
         |  FROM kept GROUP BY source),
         |raw AS (SELECT source, count(*) AS raw_docs FROM documents GROUP BY source)
         |SELECT raw.source, CAST(raw_docs AS BIGINT) AS raw_docs,
         |  CAST(coalesce(kept_docs, 0) AS BIGINT) AS kept_docs,
         |  round(coalesce(kept_docs, 0)::DOUBLE / raw_docs, 4) AS kept_share,
         |  avg_quality,
         |  coalesce(norm_chars, 0) AS norm_chars
         |FROM raw LEFT JOIN ks ON raw.source = ks.source
         |ORDER BY raw.source""".stripMargin,

    // fixture embeddings are 64-dim (FIXTURES.md); positions come from an
    // explicit range because DuckDB lacks UNNEST ... WITH ORDINALITY
    // Transitive closure as a recursive CTE: nodes seed with their own
    // id, each step adds every neighbor's reachable label, UNION dedups
    // → terminates; min over reached labels = component minimum, exactly
    // the Spark side's min-label-propagation fixpoint.
    "q50_dup_clusters" ->
      s"""WITH RECURSIVE ${LlmQueries.minhashPairsCtes},
         |pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |r AS (SELECT DISTINCT src AS id, src AS lab FROM edges
         |  UNION SELECT e.src, r.lab FROM edges e JOIN r ON e.dst = r.id),
         |cc AS (SELECT id, min(lab) AS cluster FROM r GROUP BY id)
         |SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs
         |FROM cc GROUP BY cluster ORDER BY cluster""".stripMargin,

    "q49_label_profile" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT label, pos, avg(v[pos]) AS m
        |  FROM e, (SELECT unnest(range(1, 65)) AS pos) p GROUP BY label, pos),
        |c AS (SELECT label, list(m ORDER BY pos) AS cv FROM m GROUP BY label)
        |SELECT e.label, count(*) AS n_vecs,
        |  round(avg(sqrt(list_dot_product(v, v))), 4) AS avg_norm,
        |  round(avg(list_cosine_similarity(v, cv)), 4) AS avg_centroid_cos
        |FROM e JOIN c ON e.label = c.label
        |GROUP BY e.label ORDER BY e.label""".stripMargin)
}
