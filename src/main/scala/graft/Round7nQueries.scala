package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MomentState

/** Round-7 part nine: mergeable moment profiles — daily profile
  * states roll up to any window without rescanning raw data; the
  * oracle computes the whole-table report DIRECTLY, so hash-green
  * proves merge(pre, post) ≡ direct exactly.
  */
object Round7nQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q212_profile_merge" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "user_id", "value")
      val cut = lit(Round5fQueries.PsiCutoff).cast("timestamp")
      val pre = Tables.load(s, dir, "events").filter(col("ts") < cut)
        .select("event_id", "user_id", "value")
      val post = Tables.load(s, dir, "events").filter(col("ts") >= cut)
        .select("event_id", "user_id", "value")
      // deliberately NOT state(ev): the merge of the two slice states
      // must reproduce the direct report bit-for-bit
      MomentState.report(MomentState.merge(Seq(
        MomentState.state(pre), MomentState.state(post))))
    }))

  private def colSql(c: String): String =
    s"""SELECT '$c' AS col_name, CAST(count(v) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_null,
       |  min(vm) AS min_micro, max(vm) AS max_micro,
       |  CASE WHEN count(v) > 0 THEN
       |    round(sum(CAST(vm AS HUGEINT))::DOUBLE / count(v) / 1e6, 6)
       |    END AS mean,
       |  CASE WHEN count(v) > 1 THEN
       |    round(sqrt(greatest(
       |      (sum(CAST(vm AS HUGEINT) * vm)::DOUBLE -
       |        sum(CAST(vm AS HUGEINT))::DOUBLE *
       |        sum(CAST(vm AS HUGEINT))::DOUBLE / count(v)) /
       |      (count(v)::DOUBLE - 1.0), 0.0)) / 1e6, 6) END AS stddev
       |FROM (SELECT CASE WHEN isnan($c::DOUBLE) THEN NULL
       |    ELSE $c::DOUBLE END AS v,
       |  CAST(round(CASE WHEN isnan($c::DOUBLE) THEN NULL
       |    ELSE $c::DOUBLE END * 1e6) AS BIGINT) AS vm FROM events)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q212_profile_merge" ->
      s"""SELECT * FROM (
         |${colSql("event_id")}
         |UNION ALL
         |${colSql("user_id")}
         |UNION ALL
         |${colSql("value")}
         |) ORDER BY col_name""".stripMargin)
}
