package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Round-6 part fourteen: weighted PageRank — rank mass splits
  * proportionally to co-purchase multiplicity instead of uniformly.
  */
object Round6mQueries {

  private def coPurchase(s: SparkSession, dir: String): DataFrame =
    Graph.coOccurrenceEdges(Tables.load(s, dir, "lineitem"),
      "l_orderkey", "l_partkey",
      maxGroupSize = Some(Round6bQueries.CoPurchaseCap))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q164_pagerank_weighted" -> ((s, dir) =>
      Graph.pageRankMicro(coPurchase(s, dir), Round6bQueries.PrIterations,
        "node_a", "node_b", Some("n_groups"))))

  val oracleSql: Map[String, String] = Map(
    "q164_pagerank_weighted" -> {
      def step(prev: String, out: String) =
        s"""$out AS (SELECT d.node,
           |    150000 + (85 * coalesce(s.m, 0)) // 100 AS r
           |  FROM dg d LEFT JOIN (
           |    SELECT e.dst AS node, sum((p.r * e.w) // x.deg) AS m
           |    FROM ed e JOIN $prev p ON p.node = e.src
           |    JOIN dg x ON x.node = e.src
           |    GROUP BY e.dst) s ON s.node = d.node)""".stripMargin
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
         |  FROM lineitem),
         |hot AS (SELECT g FROM li GROUP BY g
         |  HAVING count(*) > ${Round6bQueries.CoPurchaseCap}),
         |lic AS (SELECT * FROM li WHERE g NOT IN (SELECT g FROM hot)),
         |e0 AS (SELECT a.it AS na, b.it AS nb, count(*) AS w FROM lic a
         |  JOIN lic b ON a.g = b.g AND a.it < b.it GROUP BY 1, 2),
         |ed AS (SELECT na AS src, nb AS dst, w FROM e0
         |  UNION ALL SELECT nb, na, w FROM e0),
         |dg AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS deg
         |  FROM ed GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM dg),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT d.node, d.deg AS degree, CAST(r3.r AS BIGINT) AS rank_micro
         |FROM dg d JOIN r3 ON r3.node = d.node ORDER BY d.node""".stripMargin
    })
}
