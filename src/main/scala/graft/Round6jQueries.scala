package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, ProfileDrift, TextOps}

/** Round-6 part eleven: two-sample Kolmogorov–Smirnov drift (q98 PSI's
  * bin-free sibling) and Kendall's τ-b rank correlation.
  */
object Round6jQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // KS across the same mid-month cut as q98: exact cross-multiplied
    // integer numerator, first-argmax split point.
    "q158_ks_drift" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cut = lit(Round5fQueries.PsiCutoff).cast("timestamp")
      ProfileDrift.ksReport(ev.filter(col("ts") < cut),
        ev.filter(col("ts") >= cut), "event_type", "value")
    }),

    // τ-b between document length and token count — heavy ties by
    // construction; doubled-integer concordance core.
    "q159_kendall_tau" -> ((s, dir) =>
      Correlate.kendallTauB(
        docs(s, dir).withColumn("tok_n",
          size(TextOps.tokens(col("text"))).cast("long")),
        "n_chars", "tok_n")))

  val oracleSql: Map[String, String] = Map(
    "q158_ks_drift" ->
      s"""WITH v AS (SELECT event_type AS g,
         |    CAST(round(value * 1e6) AS BIGINT) AS vm,
         |    CASE WHEN ts < TIMESTAMP '${Round5fQueries.PsiCutoff}'
         |      THEN 1 ELSE 0 END AS isref FROM events),
         |h AS (SELECT g, vm, sum(isref) AS c_ref, sum(1 - isref) AS c_cur
         |  FROM v GROUP BY 1, 2),
         |w AS (SELECT *,
         |    sum(c_ref) OVER (PARTITION BY g ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
         |    sum(c_cur) OVER (PARTITION BY g ORDER BY vm
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cur,
         |    CAST(sum(c_ref) OVER (PARTITION BY g) AS BIGINT) AS n_ref,
         |    CAST(sum(c_cur) OVER (PARTITION BY g) AS BIGINT) AS n_cur
         |  FROM h),
         |d AS (SELECT *, abs(cum_ref * n_cur - cum_cur * n_ref) AS dd
         |  FROM w),
         |m AS (SELECT *, max(dd) OVER (PARTITION BY g) AS d_max FROM d)
         |SELECT g AS event_type, n_ref, n_cur,
         |  CAST(max(dd) AS BIGINT) AS d_num,
         |  CAST(min(CASE WHEN dd = d_max THEN vm END) AS BIGINT)
         |    AS argmax_micro,
         |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
         |    round(max(dd)::DOUBLE / (n_ref::DOUBLE * n_cur), 6) END AS ks
         |FROM m GROUP BY g, n_ref, n_cur ORDER BY event_type""".stripMargin,

    "q159_kendall_tau" ->
      """WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS y FROM documents),
        |cells AS (SELECT x, y, count(*) AS c FROM d GROUP BY 1, 2),
        |cd AS (SELECT CAST(sum(CAST(sign(a.x - b.x) AS BIGINT) *
        |      CAST(sign(a.y - b.y) AS BIGINT) * a.c * b.c) AS BIGINT)
        |      AS cd2
        |  FROM cells a, cells b WHERE a.x <> b.x OR a.y <> b.y),
        |st AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_cells FROM cells),
        |t1 AS (SELECT CAST(sum(t * (t - 1)) AS BIGINT) AS n1_2
        |  FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
        |t2 AS (SELECT CAST(sum(t * (t - 1)) AS BIGINT) AS n2_2
        |  FROM (SELECT sum(c) AS t FROM cells GROUP BY y))
        |SELECT st.n, st.n_cells,
        |  CAST(coalesce(cd.cd2, 0) AS BIGINT) AS cd2,
        |  CAST(st.n * (st.n - 1) AS BIGINT) AS n0_2, t1.n1_2, t2.n2_2,
        |  CASE WHEN st.n * (st.n - 1) > t1.n1_2
        |      AND st.n * (st.n - 1) > t2.n2_2 THEN
        |    round(coalesce(cd.cd2, 0)::DOUBLE /
        |      sqrt((st.n * (st.n - 1) - t1.n1_2)::DOUBLE *
        |        (st.n * (st.n - 1) - t2.n2_2)::DOUBLE), 6) END AS tau_b
        |FROM st, cd, t1, t2""".stripMargin)
}
