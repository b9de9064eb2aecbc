package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, ProfileDrift}

/** Round-6 part twenty-four: topic-sensitive PageRank (soft
  * closeness-to-seeds) and the multi-column PSI suite.
  */
object Round6wQueries {

  /** q186 seeds: the mod-97 part ids (the q139 seed convention). */
  val PprSeedMod = 97L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q186_pagerank_personalized" -> ((s, dir) => {
      // edges CACHED at the query level (round-14): the seed relation is
      // referenced by the eager seed validation, the restart-mass totals
      // AND the restart fill — uncached, each evaluation re-derived the
      // whole co-purchase graph (~7 full derivations per run measured).
      // explode, not union, for the node census (one pass, half the
      // partitions — the Graph.bothDirections rationale).
      val edges = graft.util.Caches.cached(
        Graph.coOccurrenceEdges(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey",
          maxGroupSize = Some(Round6bQueries.CoPurchaseCap)))
      // seeds cached too: the operator's eager validation, the Σw
      // totals and the restart fill each re-evaluate it otherwise
      val seeds = graft.util.Caches.cached(edges
        .select(explode(array(col("node_a"), col("node_b"))).as("node"))
        .distinct()
        .filter(pmod(col("node"), lit(PprSeedMod)) === 0)
        .withColumn("w", lit(1L)))
      Graph.pageRankPersonalizedMicro(edges, Round6bQueries.PrIterations,
        seeds)
    }),

    "q187_psi_suite" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val cut = lit(Round6vQueries.ShipCutoff).cast("timestamp")
      ProfileDrift.psiSuite(li.filter(col("l_shipdate") < cut),
        li.filter(col("l_shipdate") >= cut), Round6vQueries.DriftCols)
    }))

  val oracleSql: Map[String, String] = Map(
    "q186_pagerank_personalized" -> {
      def step(prev: String, out: String) =
        s"""$out AS (SELECT rs.node,
           |    rs.restart + (85 * coalesce(s.m, 0)) // 100 AS r
           |  FROM rs LEFT JOIN (
           |    SELECT e.dst AS node, sum(p.r // x.deg) AS m
           |    FROM ed e JOIN $prev p ON p.node = e.src
           |    JOIN dg x ON x.node = e.src
           |    GROUP BY e.dst) s ON s.node = rs.node)""".stripMargin
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
         |  FROM lineitem),
         |hot AS (SELECT g FROM li GROUP BY g
         |  HAVING count(*) > ${Round6bQueries.CoPurchaseCap}),
         |lic AS (SELECT * FROM li WHERE g NOT IN (SELECT g FROM hot)),
         |e0 AS (SELECT a.it AS na, b.it AS nb FROM lic a
         |  JOIN lic b ON a.g = b.g AND a.it < b.it GROUP BY 1, 2),
         |ed AS (SELECT na AS src, nb AS dst FROM e0
         |  UNION ALL SELECT nb, na FROM e0),
         |dg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |  FROM ed GROUP BY 1),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM dg),
         |sd AS (SELECT node, CAST(1 AS BIGINT) AS w FROM dg
         |  WHERE node % $PprSeedMod = 0),
         |sw AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM sd),
         |rs AS (SELECT d.node, CAST((150000 * tt.n_nodes *
         |    coalesce(sd.w, 0)) // sw.sw AS BIGINT) AS restart
         |  FROM dg d LEFT JOIN sd ON sd.node = d.node, tt, sw),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM dg),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT d.node, d.deg AS degree,
         |  rs.restart AS restart_micro, CAST(r3.r AS BIGINT) AS rank_micro
         |FROM dg d JOIN rs ON rs.node = d.node JOIN r3 ON r3.node = d.node
         |ORDER BY d.node""".stripMargin
    },

    "q187_psi_suite" -> {
      val half = 10 / 2.0
      def share(c: String, n: String) = s"(($c + 0.5) / ($n + $half))"
      val p = share("c_ref", "n_ref")
      val q = share("c_cur", "n_cur")
      val melt = Round6vQueries.DriftCols.map(c =>
        s"SELECT '$c' AS f, $c AS value, l_shipdate FROM lineitem")
        .mkString(" UNION ALL ")
      s"""WITH m AS ($melt),
         |r AS (SELECT f AS g, value AS v FROM m
         |    WHERE l_shipdate < TIMESTAMP '${Round6vQueries.ShipCutoff}'
         |      AND value IS NOT NULL),
         |c AS (SELECT f AS g, value AS v FROM m
         |    WHERE l_shipdate >= TIMESTAMP '${Round6vQueries.ShipCutoff}'
         |      AND value IS NOT NULL),
         |b AS (SELECT g, min(v) AS lo,
         |    (max(v) - min(v)) / 10 AS width FROM r GROUP BY g),
         |hr AS (SELECT r.g,
         |    CASE WHEN b.width > 0 THEN least(9, greatest(0,
         |      CAST(floor((r.v - b.lo) / b.width) AS INTEGER)))
         |    ELSE 0 END AS bucket, count(*) AS c_ref
         |  FROM r JOIN b USING (g) GROUP BY 1, 2),
         |hc AS (SELECT c.g,
         |    CASE WHEN b.width > 0 THEN least(9, greatest(0,
         |      CAST(floor((c.v - b.lo) / b.width) AS INTEGER)))
         |    ELSE 0 END AS bucket, count(*) AS c_cur
         |  FROM c JOIN b USING (g) GROUP BY 1, 2),
         |h AS (SELECT coalesce(hr.g, hc.g) AS g,
         |    coalesce(hr.bucket, hc.bucket) AS bucket,
         |    coalesce(c_ref, 0) AS c_ref, coalesce(c_cur, 0) AS c_cur
         |  FROM hr FULL OUTER JOIN hc
         |    ON hr.g = hc.g AND hr.bucket = hc.bucket),
         |t AS (SELECT g, CAST(sum(c_ref) AS BIGINT) AS n_ref,
         |    CAST(sum(c_cur) AS BIGINT) AS n_cur
         |  FROM h GROUP BY g
         |  HAVING sum(c_ref) > 0 AND sum(c_cur) > 0),
         |k AS (SELECT h.g, t.n_ref, t.n_cur,
         |    CAST(round((($p - $q) * ln($p / $q)) * 1000000000.0)
         |      AS BIGINT) AS nano
         |  FROM h JOIN t USING (g))
         |SELECT g AS feature, n_ref, n_cur,
         |  round(sum(nano) / 1000000000.0, 6) AS psi
         |FROM k GROUP BY g, n_ref, n_cur ORDER BY feature""".stripMargin
    })
}
