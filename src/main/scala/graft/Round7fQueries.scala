package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-7 part one: the two documented-but-unoracled production tiers
  * get binding oracles — passage dedup over 64-bit fingerprints
  * (q155a) and the LSH-blocked kNN consumers (q169a hard negatives,
  * q179a label-noise vote).
  */
object Round7fQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The 100 TB passage-census tier: passages swap for xxhash64
    // fingerprints before the census + join-back (8-byte shuffle keys
    // instead of ~10-word strings). The oracle is the COLLISION-FREE
    // reference (raw-string census): hash-green here proves the
    // fingerprint path emits identical counts at fixture scale, i.e.
    // no collision and no keying bug.
    "q155a_passage_fingerprint" -> ((s, dir) =>
      Dedup.passageDupStats(Tables.load(s, dir, "documents"),
        Round6iQueries.PassageWords, fingerprint = true)),

    // Hard-negative mining restricted to the anchors' multi-probe LSH
    // buckets — the oracle rebuilds the same 6-plane bucket predicate
    // (q37's CTE chain) plus the different-label clause, so the
    // restriction BINDS: any divergence from the bucket membership the
    // Scala side computes flips the hash.
    "q169a_hard_negatives_lsh" -> ((s, dir) =>
      Similarity.hardNegativesLsh(Tables.load(s, dir, "embeddings"),
        Round6oQueries.HardNegQueryIds, Round6oQueries.HardNegK)),

    // The label-noise kNN vote over the same LSH candidate restriction.
    "q179a_label_noise_lsh" -> ((s, dir) =>
      Similarity.labelAgreementLsh(Tables.load(s, dir, "embeddings"),
        Round6sQueries.NoiseAnchorIds, Round6sQueries.NoiseK)))

  /** Shared oracle CTE chain: per-vector 6-plane LSH buckets and the
    * anchors' 7-probe (own + Hamming-1) bucket fan-out, the exact SQL
    * twin of [[Similarity.lshBucket]] + the probe explode.
    */
  private def lshCtes(ids: String): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
       |  FROM embeddings),
       |d AS (SELECT vec_id, p, sum(v[j] * w) AS dot
       |  FROM e, ${LlmQueries.planesValuesSql} GROUP BY vec_id, p),
       |bk AS (SELECT vec_id, CAST(sum(CASE WHEN dot >= 0
       |    THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM d GROUP BY vec_id),
       |eb AS (SELECT e.vec_id, v, label, bucket
       |  FROM e JOIN bk ON e.vec_id = bk.vec_id),
       |q AS (SELECT vec_id AS query_id, v AS qv, label AS ql,
       |    xor(bucket, m) AS bucket
       |  FROM eb, (VALUES (0), (1), (2), (4), (8), (16), (32)) AS probes(m)
       |  WHERE vec_id IN $ids)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Collision-free reference census (identical to q155's oracle):
    // the fingerprint path must reproduce it exactly at this scale.
    "q155a_passage_fingerprint" -> Round6iQueries.oracleSql("q155_passage_dedup"),

    "q169a_hard_negatives_lsh" -> {
      val ids = Round6oQueries.HardNegQueryIds.mkString("(", ", ", ")")
      s"""${lshCtes(ids)},
         |s AS (SELECT query_id, ql AS q_label, eb.vec_id,
         |    label AS neg_label,
         |    round(list_cosine_similarity(qv, v), 4) AS cos_sim
         |  FROM q JOIN eb ON q.bucket = eb.bucket AND eb.label <> q.ql),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank FROM s)
         |SELECT query_id, q_label, vec_id, neg_label, cos_sim, rank
         |FROM r WHERE rank <= ${Round6oQueries.HardNegK}
         |ORDER BY query_id, rank""".stripMargin
    },

    "q179a_label_noise_lsh" -> {
      val ids = Round6sQueries.NoiseAnchorIds.mkString("(", ", ", ")")
      s"""${lshCtes(ids)},
         |s AS (SELECT query_id, ql, eb.vec_id, label AS nb,
         |    round(list_cosine_similarity(qv, v), 4) AS cs
         |  FROM q JOIN eb ON q.bucket = eb.bucket
         |    AND eb.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cs DESC, vec_id) AS rk FROM s)
         |SELECT query_id, ql AS q_label,
         |  CAST(count(*) AS BIGINT) AS k_used,
         |  CAST(sum(CASE WHEN nb = ql THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_agree,
         |  CAST((sum(CASE WHEN nb = ql THEN 1 ELSE 0 END) * 1000000)
         |    // count(*) AS BIGINT) AS agree_ppm,
         |  (2 * sum(CASE WHEN nb = ql THEN 1 ELSE 0 END) < count(*))
         |    AS suspect
         |FROM r WHERE rk <= ${Round6sQueries.NoiseK}
         |GROUP BY query_id, ql ORDER BY query_id""".stripMargin
    })
}
