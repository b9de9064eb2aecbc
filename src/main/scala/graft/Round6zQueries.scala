package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Correlate

/** Round-6 part twenty-seven: decision-stump best-split search (where
  * does a numeric feature separate the classes).
  */
object Round6zQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // best length threshold separating English from non-English docs
    "q192_best_split" -> ((s, dir) =>
      Correlate.bestSplit(Tables.load(s, dir, "documents"),
        "n_chars", col("lang") === "en")))

  val oracleSql: Map[String, String] = Map(
    "q192_best_split" -> {
      def cell(c: String, side: String) =
        s"""CASE WHEN $c > 0 THEN CAST(round(($c::DOUBLE / n) *
           |      ln($side::DOUBLE / $c) * 1e9) AS BIGINT) ELSE 0 END"""
          .stripMargin
      s"""WITH c AS (SELECT CAST(round(n_chars * 1e6) AS BIGINT) AS vm,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents),
         |h AS (SELECT vm, CAST(sum(y) AS BIGINT) AS c1,
         |    CAST(sum(1 - y) AS BIGINT) AS c0 FROM c GROUP BY 1),
         |w AS (SELECT *,
         |    sum(c1) OVER (ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         |    sum(c0) OVER (ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0,
         |    CAST(sum(c1) OVER () AS BIGINT) AS n1,
         |    CAST(sum(c0) OVER () AS BIGINT) AS n0 FROM h),
         |e AS (SELECT *, n1 + n0 AS n, cum1 + cum0 AS nl,
         |    (n1 + n0) - (cum1 + cum0) AS nr FROM w),
         |f AS (SELECT * FROM e WHERE nr > 0),
         |g AS (SELECT *,
         |    ${cell("cum1", "nl")} + ${cell("cum0", "nl")} +
         |    (CASE WHEN n1 - cum1 > 0 THEN CAST(round(
         |      ((n1 - cum1)::DOUBLE / n) * ln(nr::DOUBLE / (n1 - cum1))
         |        * 1e9) AS BIGINT) ELSE 0 END) +
         |    (CASE WHEN n0 - cum0 > 0 THEN CAST(round(
         |      ((n0 - cum0)::DOUBLE / n) * ln(nr::DOUBLE / (n0 - cum0))
         |        * 1e9) AS BIGINT) ELSE 0 END) AS h_cond_nano,
         |    ${cell("n1", "n")} + ${cell("n0", "n")} AS h_label_nano
         |  FROM f),
         |b AS (SELECT *, h_label_nano - h_cond_nano AS ig,
         |    max(h_label_nano - h_cond_nano) OVER () AS big FROM g)
         |SELECT n, n1 AS n_pos, h_label_nano,
         |  CAST(min(vm) AS BIGINT) AS best_threshold_micro,
         |  CAST(h_label_nano - big AS BIGINT) AS h_cond_nano,
         |  CAST(big AS BIGINT) AS ig_nano
         |FROM b WHERE ig = big
         |GROUP BY n, n1, h_label_nano, big""".stripMargin
    })
}
