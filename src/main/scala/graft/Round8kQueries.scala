package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Preference}

/** Round-8 part eleven: missing-tolerant multi-rater agreement
  * (Krippendorff) and the stratified pooled effect (Mantel–Haenszel).
  */
object Round8kQueries {

  /** Panel bound for Krippendorff (clears denominators via
    * lcm(1..3) = 6).
    */
  val KaMaxRaters = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Agreement over each user's first-up-to-4-event panel — unlike
    // q246's Fleiss, users with only 2 or 3 events still count.
    "q251_krippendorff_alpha" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val ratings = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= KaMaxRaters)
      Preference.krippendorffAlpha(ratings, "user_id", "event_type",
        KaMaxRaters)
    }),

    // Does a positive balance associate with the BUILDING segment
    // once pooled within nations — the confounder-proof odds ratio.
    "q252_mantel_haenszel" -> ((s, dir) =>
      Experiment.mantelHaenszel(Tables.load(s, dir, "customer"),
        "c_nationkey", col("c_acctbal") >= 0,
        col("c_mktsegment") === "BUILDING")))

  val oracleSql: Map[String, String] = Map(
    "q251_krippendorff_alpha" ->
      s"""WITH r AS (SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn FROM events),
         |cen AS (SELECT user_id AS item, event_type AS cat,
         |    CAST(count(*) AS BIGINT) AS c FROM r
         |  WHERE rn <= $KaMaxRaters GROUP BY 1, 2),
         |pi AS (SELECT item, CAST(sum(c) AS BIGINT) AS m,
         |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sq
         |  FROM cen GROUP BY 1 HAVING sum(c) >= 2),
         |it AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |    CAST(sum(m) AS BIGINT) AS n_ratings,
         |    CAST(sum(((CAST(m AS HUGEINT) * m - sq) * 6) // (m - 1))
         |      AS HUGEINT) AS o_off_s
         |  FROM pi),
         |ct AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
         |    CAST(sum(CAST(n_c AS HUGEINT) * n_c) AS HUGEINT) AS sq_c
         |  FROM (SELECT cat, CAST(sum(c) AS BIGINT) AS n_c
         |    FROM cen JOIN pi USING (item) GROUP BY 1)),
         |o AS (SELECT n_items, n_ratings, n_categories, o_off_s,
         |    (CAST(n_ratings AS HUGEINT) * n_ratings - sq_c) * 6
         |      AS d_e_s
         |  FROM it, ct)
         |SELECT n_items, n_ratings, n_categories,
         |  CASE WHEN d_e_s > 0 THEN round(1.0 -
         |    ((n_ratings - 1)::DOUBLE * o_off_s::DOUBLE) /
         |    d_e_s::DOUBLE, 6) END AS alpha
         |FROM o""".stripMargin,

    "q252_mantel_haenszel" ->
      """WITH cl AS (SELECT c_nationkey AS s,
        |    CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS e,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
        |      AS y
        |  FROM customer),
        |cells AS (SELECT s, CAST(sum(e * y) AS BIGINT) AS a,
        |    CAST(sum(e * (1 - y)) AS BIGINT) AS b,
        |    CAST(sum((1 - e) * y) AS BIGINT) AS c,
        |    CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS d
        |  FROM cl GROUP BY 1),
        |w AS (SELECT *, a + b + c + d AS n_i FROM cells),
        |agg AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(a) AS BIGINT) AS sum_a,
        |    CAST(sum((CAST(a AS HUGEINT) * d * 1000000) // n_i)
        |      AS HUGEINT) AS r_micro,
        |    CAST(sum((CAST(b AS HUGEINT) * c * 1000000) // n_i)
        |      AS HUGEINT) AS s_micro,
        |    CAST(sum((CAST(a + b AS HUGEINT) * (a + c) * 1000000)
        |      // n_i) AS HUGEINT) AS e_micro,
        |    CAST(sum(CASE WHEN n_i > 1 THEN
        |      (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
        |        * 1000000) //
        |      (CAST(n_i AS HUGEINT) * n_i * (n_i - 1)) ELSE 0 END)
        |      AS HUGEINT) AS v_micro
        |  FROM w)
        |SELECT n, n_strata, sum_a,
        |  CASE WHEN s_micro > 0 THEN
        |    round(r_micro::DOUBLE / s_micro::DOUBLE, 6) END AS or_mh,
        |  CASE WHEN v_micro > 0 THEN
        |    round((abs(sum_a::DOUBLE - e_micro::DOUBLE / 1e6) - 0.5)
        |      * (abs(sum_a::DOUBLE - e_micro::DOUBLE / 1e6) - 0.5)
        |      / (v_micro::DOUBLE / 1e6), 6) END AS chi2_cmh
        |FROM agg""".stripMargin)
}
