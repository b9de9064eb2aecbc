package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, ProfileDrift}

/** Round-6 part twenty-five: item–item co-occurrence recommendations
  * and the trimmed-mean robust location shift.
  */
object Round6xQueries {

  val RecsK = 5
  val TrimPct = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q188_item_recs" -> ((s, dir) =>
      Graph.itemSimilarityTopK(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", RecsK,
        maxGroupSize = Some(Round6bQueries.CoPurchaseCap))),

    "q189_trimmed_shift" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cut = lit(Round5fQueries.PsiCutoff).cast("timestamp")
      ProfileDrift.trimmedMeanShift(ev.filter(col("ts") < cut),
        ev.filter(col("ts") >= cut), "event_type", "value", TrimPct)
    }))

  val oracleSql: Map[String, String] = Map(
    "q188_item_recs" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
         |  FROM lineitem),
         |hot AS (SELECT g FROM li GROUP BY g
         |  HAVING count(*) > ${Round6bQueries.CoPurchaseCap}),
         |base AS (SELECT * FROM li WHERE g NOT IN (SELECT g FROM hot)),
         |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS n_it FROM base
         |  GROUP BY it),
         |p AS (SELECT a.it AS it_a, b.it AS it_b,
         |    CAST(count(*) AS BIGINT) AS n_both
         |  FROM base a JOIN base b ON a.g = b.g AND a.it < b.it
         |  GROUP BY 1, 2),
         |d AS (SELECT it_a AS item, it_b AS other, n_both FROM p
         |  UNION ALL SELECT it_b, it_a, n_both FROM p),
         |sc AS (SELECT d.item, d.other, a.n_it AS n_item,
         |    b.n_it AS n_other, d.n_both,
         |    round(d.n_both / sqrt(a.n_it::DOUBLE * b.n_it), 6) AS cos_sim
         |  FROM d JOIN ic a ON a.it = d.item JOIN ic b ON b.it = d.other),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY item
         |    ORDER BY cos_sim DESC, other) AS INTEGER) AS rank FROM sc)
         |SELECT item, other, n_item, n_other, n_both, cos_sim, rank
         |FROM r WHERE rank <= $RecsK ORDER BY item, rank""".stripMargin,

    "q189_trimmed_shift" ->
      s"""WITH v AS (SELECT CASE WHEN ts <
         |      TIMESTAMP '${Round5fQueries.PsiCutoff}'
         |      THEN 'ref' ELSE 'cur' END AS side, event_type AS g,
         |    CAST(round(value * 1e6) AS BIGINT) AS vm FROM events),
         |h AS (SELECT side, g, vm, count(*) AS c FROM v GROUP BY 1, 2, 3),
         |w AS (SELECT *,
         |    sum(c) OVER (PARTITION BY side, g ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY side, g) AS BIGINT) AS n
         |  FROM h),
         |e AS (SELECT *, (n * $TrimPct) // 100 AS t,
         |    greatest(0, least(cum, n - (n * $TrimPct) // 100) -
         |      greatest(cum - c, (n * $TrimPct) // 100)) AS keep
         |  FROM w),
         |s AS (SELECT side, g, n, t,
         |    CAST(sum(vm * keep) AS BIGINT) AS ts_sum,
         |    CASE WHEN n - 2 * t > 0 THEN
         |      CAST(CAST(sum(vm * keep) AS BIGINT) // (n - 2 * t)
         |        AS BIGINT) END AS mean_micro
         |  FROM e GROUP BY 1, 2, 3, 4)
         |SELECT g AS event_type,
         |  max(CASE WHEN side = 'ref' THEN n END) AS n_ref,
         |  max(CASE WHEN side = 'cur' THEN n END) AS n_cur,
         |  max(CASE WHEN side = 'ref' THEN t END) AS trim_ref,
         |  max(CASE WHEN side = 'cur' THEN t END) AS trim_cur,
         |  max(CASE WHEN side = 'ref' THEN mean_micro END)
         |    AS mean_ref_micro,
         |  max(CASE WHEN side = 'cur' THEN mean_micro END)
         |    AS mean_cur_micro,
         |  max(CASE WHEN side = 'cur' THEN mean_micro END) -
         |    max(CASE WHEN side = 'ref' THEN mean_micro END)
         |    AS shift_micro
         |FROM s GROUP BY g ORDER BY event_type""".stripMargin)
}
