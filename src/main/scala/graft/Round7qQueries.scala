package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity

/** Round-7 part twelve: top-PCA-direction by relational power
  * iteration over the embedding covariance.
  */
object Round7qQueries {

  val EigenRounds = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_top_eigen" -> ((s, dir) =>
      Similarity.topEigenReport(Tables.load(s, dir, "embeddings"),
        EigenRounds)))

  /** One power-iteration round: w = C·v, then ∞-norm renormalize with
    * the sign split off the floor division (// on non-negative ≡
    * Spark's div).
    */
  private def roundSql(k: Int): String =
    s"""w$k AS (SELECT cf.i AS dim,
       |    CAST(sum(CAST(cf.cov_num AS HUGEINT) * v${k - 1}.v_micro)
       |      AS HUGEINT) AS w
       |  FROM cf JOIN v${k - 1} ON v${k - 1}.dim = cf.j GROUP BY 1),
       |m$k AS (SELECT max(abs(w)) AS mx FROM w$k),
       |v$k AS (SELECT dim, CAST((CASE WHEN w < 0 THEN -1 ELSE 1 END) *
       |    ((abs(w) * 1000000) // greatest(mx, 1::HUGEINT)) AS BIGINT)
       |    AS v_micro
       |  FROM w$k, m$k)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q215_top_eigen" -> {
      val rounds = (1 to EigenRounds).map(roundSql).mkString(",\n")
      s"""WITH v AS (SELECT vec_id, CAST(t.i AS INTEGER) AS i,
         |    CAST(round(embedding[t.i] * 1e6) AS BIGINT) AS x
         |  FROM embeddings, range(1, 65) t(i)),
         |p AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT)
         |    AS s_xy
         |  FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY 1, 2),
         |c AS (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM v GROUP BY i),
         |nn AS (SELECT count(*) AS n FROM embeddings),
         |cu AS (SELECT p.i, p.j,
         |    CAST(nn.n * p.s_xy - ca.s * cb.s AS BIGINT) AS cov_num
         |  FROM p, nn JOIN c ca ON ca.i = p.i JOIN c cb ON cb.i = p.j),
         |cf AS (SELECT i, j, cov_num FROM cu
         |  UNION ALL SELECT j, i, cov_num FROM cu WHERE i <> j),
         |v0 AS (SELECT DISTINCT i AS dim, CAST(1000000 AS BIGINT)
         |    AS v_micro FROM cf),
         |$rounds,
         |wf AS (SELECT cf.i AS dim,
         |    CAST(sum(CAST(cf.cov_num AS HUGEINT) *
         |      v$EigenRounds.v_micro) AS HUGEINT) AS w
         |  FROM cf JOIN v$EigenRounds ON v$EigenRounds.dim = cf.j
         |  GROUP BY 1),
         |rs AS (SELECT sum(CAST(v.v_micro AS HUGEINT) * wf.w) AS num,
         |    sum(CAST(v.v_micro AS HUGEINT) * v.v_micro) AS den
         |  FROM v$EigenRounds v JOIN wf ON wf.dim = v.dim),
         |ray AS (SELECT CASE WHEN den > 0 THEN
         |    CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
         |      (abs(num) // den) AS BIGINT) END AS lambda FROM rs)
         |SELECT v.dim, v.v_micro, ray.lambda
         |FROM v$EigenRounds v, ray ORDER BY v.dim""".stripMargin
    })
}
