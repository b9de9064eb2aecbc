package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Concentration, Correlate}

/** Round-6 part four: chi-square independence (the significance sibling
  * of q134's MI), Gini concentration (value-domain inequality summary),
  * and CDC latest-wins snapshot apply (the MERGE sibling of q121's SCD2
  * intervals).
  *
  * Oracle conventions as Round6b: integer hash cores, BIGINT casts at
  * every DuckDB sum boundary, value-domain windows, doubles only as
  * final rounded derivations with identical operation order.
  */
object Round6cQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** q138's synthetic changelog over orders: one change per order keyed
    * by customer, sequenced by the (unique) order key, every 19th order
    * a delete — ~8% of the 1,500 customers end deleted at sf0.01 and the
    * rest split between updated and untouched, so all three merge paths
    * carry rows.
    */
  private def changelog(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      col("o_custkey").as("c_custkey"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 19 === 0, lit("D")).otherwise(lit("U")).as("op"),
      concat(lit("Customer#upd"), col("o_orderkey")).as("c_name"),
      (col("o_orderkey") % 25).cast("int").as("c_nationkey"),
      col("o_totalprice").as("c_acctbal"),
      col("o_orderpriority").as("c_mktsegment"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Chi-square independence of event_type × day-of-week: full grid
    // reconstituted from the marginals (zero cells contribute), integer
    // chi_num core, nano contributions, Cramér's V at 6 dp.
    "q136_chi_square" -> ((s, dir) =>
      Correlate.chiSquare(
        events(s, dir).withColumn("dow", dayofweek(col("ts"))),
        "event_type", "dow")),

    // Gini concentration of document length per source: distinct-value
    // histogram windows only; DECIMAL(38,0) numerator lands as BIGINT.
    "q137_gini" -> ((s, dir) =>
      Concentration.giniReport(docs(s, dir), "source", "n_chars")),

    // CDC latest-wins snapshot: fold the order-derived changelog onto
    // customer — one changelog shuffle, one anti join, union; the base
    // is never scanned twice.
    "q138_cdc_snapshot" -> ((s, dir) =>
      Cdc.applyChanges(Tables.load(s, dir, "customer"),
        changelog(s, dir), "c_custkey", "seq", "op")
        .orderBy("c_custkey")))

  val oracleSql: Map[String, String] = Map(
    // Same grid algebra: marginal cross, left-join census, windows over
    // the stat grid; contribution doubles multiply in the same order.
    "q136_chi_square" ->
      """WITH c AS (SELECT event_type AS a,
        |    CAST(dayofweek(ts) + 1 AS INTEGER) AS b, count(*) AS n_ab
        |  FROM events GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM c GROUP BY a),
        |mb AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS n_b FROM c GROUP BY b),
        |g AS (SELECT ma.a, mb.b, CAST(coalesce(c.n_ab, 0) AS BIGINT) AS n_ab,
        |    ma.n_a, mb.n_b
        |  FROM ma CROSS JOIN mb LEFT JOIN c ON c.a = ma.a AND c.b = mb.b),
        |w AS (SELECT *, CAST(sum(n_ab) OVER () AS BIGINT) AS n,
        |    count(*) OVER (PARTITION BY b) AS nla,
        |    count(*) OVER (PARTITION BY a) AS nlb FROM g),
        |k AS (SELECT *, CAST(n * n_ab - n_a * n_b AS BIGINT) AS chi_num,
        |    CAST(round(
        |      (CAST(n * n_ab - n_a * n_b AS DOUBLE) *
        |       CAST(n * n_ab - n_a * n_b AS DOUBLE)) /
        |      (n::DOUBLE * n_a * n_b) * 1e9) AS BIGINT) AS contrib_nano
        |  FROM w)
        |SELECT a AS event_type, b AS dow, n_ab, n_a, n_b, chi_num,
        |  contrib_nano,
        |  CAST(sum(contrib_nano) OVER () AS BIGINT) AS chi2_nano,
        |  CAST((nla - 1) * (nlb - 1) AS BIGINT) AS dof,
        |  CASE WHEN (nla - 1) * (nlb - 1) > 0 AND n > 0 THEN
        |    round(sqrt((sum(contrib_nano) OVER ()) / 1e9 /
        |      (n::DOUBLE * least(nla - 1, nlb - 1))), 6) END AS cramers_v
        |FROM k ORDER BY event_type, dow""".stripMargin,

    // Tied-run telescoping: v·c·(2·cum + c − n) per distinct value.
    "q137_gini" ->
      """WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
        |    count(*) AS c FROM documents GROUP BY 1, 2),
        |w AS (SELECT *,
        |    coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n,
        |    sum(v * c) OVER (PARTITION BY g) AS total FROM h),
        |a AS (SELECT g, CAST(max(n) AS BIGINT) AS n_rows,
        |    CAST(max(total) AS BIGINT) AS sum_val,
        |    CAST(sum(v * c * (2 * cum + c - n)) AS BIGINT) AS gini_num
        |  FROM w GROUP BY g)
        |SELECT g AS source, n_rows, sum_val, gini_num,
        |  CASE WHEN sum_val > 0 THEN
        |    round(gini_num::DOUBLE / (n_rows::DOUBLE * sum_val), 6)
        |  END AS gini
        |FROM a ORDER BY source""".stripMargin,

    // Latest-wins by unique seq; deletes drop keys, upserts replace or
    // insert, untouched base rows pass through.
    "q138_cdc_snapshot" ->
      """WITH ch AS (SELECT o_custkey AS k, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 19 = 0 THEN 'D' ELSE 'U' END AS op,
        |    'Customer#upd' || o_orderkey AS c_name,
        |    CAST(o_orderkey % 25 AS INTEGER) AS c_nationkey,
        |    o_totalprice AS c_acctbal, o_orderpriority AS c_mktsegment
        |  FROM orders),
        |lt AS (SELECT * FROM ch QUALIFY
        |    row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1),
        |keep AS (SELECT c.* FROM customer c
        |  WHERE c.c_custkey NOT IN (SELECT k FROM lt)),
        |up AS (SELECT k AS c_custkey, c_name, c_nationkey, c_acctbal,
        |    c_mktsegment FROM lt WHERE op <> 'D')
        |SELECT * FROM keep UNION ALL SELECT * FROM up
        |ORDER BY c_custkey""".stripMargin)
}
