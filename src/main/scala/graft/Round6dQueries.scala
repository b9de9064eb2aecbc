package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Similarity, Standardize}

/** Round-6 part five: k-hop BFS reachability over the co-purchase graph
  * (frontier expansion vs an unrolled min-propagation oracle), the
  * embedding covariance matrix off the one-pass Gram aggregate, and
  * quantile normalization (value-domain rank mapping).
  */
object Round6dQueries {

  /** Seed rule for q139: part keys ≡ 0 (mod 97) — ~20 of the ~2,000
    * graph nodes at sf0.01, spread across the key range so the 3-hop
    * frontier reaches a strict subset (unreached NULLs survive at the
    * gate SF).
    */
  val SeedMod = 97L
  val KhopK = 3

  private def coPurchase(s: SparkSession, dir: String): DataFrame =
    Graph.coOccurrenceEdges(Tables.load(s, dir, "lineitem"),
      "l_orderkey", "l_partkey",
      maxGroupSize = Some(Round6bQueries.CoPurchaseCap))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Frontier BFS from the mod-97 seed set: each round joins only the
    // newly-reached frontier against the cached directed edges — O(E)
    // total traversal, localCheckpoint'd rounds, nothing collected.
    "q139_khop_reach" -> ((s, dir) => {
      val e = graft.util.Caches.cached(coPurchase(s, dir))
      val seeds = e
        .select(explode(array(col("node_a"), col("node_b"))).as("node"))
        .filter(col("node") % SeedMod === 0).distinct()
      Graph.khopMinDist(e, seeds, KhopK)
    }),

    // d×d covariance from ONE Gram-aggregate pass over the embeddings:
    // the buffer carries all d(d+3)/2+1 sums; cells unfold from the
    // single stat row. cov_num is the integer hash core.
    "q140_embedding_cov" -> ((s, dir) =>
      Similarity.covarianceMatrix(Tables.load(s, dir, "embeddings"))),

    // Quantile-normalize document length per source onto the pooled
    // distribution: value-domain census + cumulative windows, pooled
    // side broadcast into the containment join.
    "q141_quantile_norm" -> ((s, dir) =>
      Standardize.quantileNormalize(
        Tables.load(s, dir, "documents"), "source", "n_chars")))

  val oracleSql: Map[String, String] = Map(
    // Min-propagation unrolled K times ≡ frontier BFS min-hop ≤ K.
    "q139_khop_reach" -> {
      def step(prev: String, out: String) =
        s"""$out AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT node, dist FROM $prev UNION ALL
           |    SELECT e.dst, p.dist + 1 FROM ed e
           |      JOIN $prev p ON p.node = e.src) GROUP BY node)""".stripMargin
      s"""WITH ${Round6bQueries.edgesSql},
         |s0 AS (SELECT node, 0 AS dist FROM dg WHERE node % $SeedMod = 0),
         |${step("s0", "s1")},
         |${step("s1", "s2")},
         |${step("s2", "s3")}
         |SELECT d.node, d.deg AS degree, CAST(s3.dist AS INTEGER) AS dist
         |FROM dg d LEFT JOIN s3 ON s3.node = d.node
         |ORDER BY d.node""".stripMargin
    },

    // Same micro quantization (HALF_UP round on the float→double value),
    // exact integer sums; the oracle affords the d² lateral blow-up the
    // Gram aggregate exists to avoid.
    "q140_embedding_cov" ->
      """WITH v AS (SELECT vec_id, CAST(t.i AS INTEGER) AS i,
        |    CAST(round(embedding[t.i] * 1e6) AS BIGINT) AS x
        |  FROM embeddings, range(1, 65) t(i)),
        |p AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT)
        |    AS s_xy
        |  FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2),
        |c AS (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM v GROUP BY i),
        |n AS (SELECT count(*) AS n FROM embeddings)
        |SELECT p.i, p.j, CAST(n.n AS BIGINT) AS n, ca.s AS s_x,
        |  cb.s AS s_y, p.s_xy,
        |  CAST(n.n * p.s_xy - ca.s * cb.s AS BIGINT) AS cov_num,
        |  CASE WHEN n.n > 1 THEN
        |    round(CAST(n.n * p.s_xy - ca.s * cb.s AS DOUBLE) /
        |      (n.n::DOUBLE * (n.n - 1)) / 1e12, 9) END AS cov
        |FROM p, n
        |JOIN c ca ON ca.i = p.i JOIN c cb ON cb.i = p.j
        |ORDER BY p.i, p.j""".stripMargin,

    // Max-rank of each tied run → pooled ordinal ⌈cum_hi·N/n_g⌉ picked
    // by cumulative-interval containment.
    "q141_quantile_norm" ->
      """WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
        |    count(*) AS c FROM documents GROUP BY 1, 2),
        |grp AS (SELECT *,
        |    sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hi,
        |    sum(c) OVER (PARTITION BY g) AS n_g,
        |    sum(c) OVER () AS n_all FROM h),
        |j AS (SELECT g, v, CAST(c AS BIGINT) AS c,
        |    CAST((cum_hi * n_all + n_g - 1) // n_g AS BIGINT) AS p
        |  FROM grp),
        |pl AS (SELECT v, sum(c) AS pc FROM h GROUP BY v),
        |pool AS (SELECT v AS v_norm,
        |    sum(pc) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
        |    sum(pc) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - pc AS lo
        |  FROM pl)
        |SELECT j.g AS source, j.v AS value, j.c AS n_rows,
        |  j.p AS pooled_rank, CAST(pool.v_norm AS BIGINT) AS v_norm
        |FROM j JOIN pool ON j.p > pool.lo AND j.p <= pool.hi
        |ORDER BY source, value""".stripMargin)
}
