package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bootstrap, Privacy, TimeSeries}

/** Round-6 part six: CUSUM changepoint detection (sequential fold over
  * the stat-grain daily series vs a recursive-CTE oracle), deterministic
  * Poisson-bootstrap confidence intervals (hash-replayable resampling),
  * and l-diversity (the homogeneity-attack complement of q131).
  */
object Round6eQueries {

  /** q143's replicate count: 24 gives a 2nd/23rd order-statistic
    * interval (~92% coverage) while keeping the aggregate row at
    * 2·24+2 longs.
    */
  val BootReplicates = 24

  /** q144's diversity floor: at sf0.01 the (lang, source) × length-hectochar
    * census leaves several classes under 3 distinct buckets, so both
    * flags bind.
    */
  val DiversityL = 3L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Upper CUSUM over each event type's daily micro-volume: integer
    // fold over the key's sorted (day, y) array; peak statistic + first
    // peak day. One corpus scan into the daily aggregate.
    "q142_cusum" -> ((s, dir) =>
      TimeSeries.cusumReport(Tables.load(s, dir, "events"), "event_type")),

    // Poisson-bootstrap mean CI per event type: 24 deterministic
    // hash-weighted replicates as extra aggregate columns on ONE scan.
    "q143_bootstrap_ci" -> ((s, dir) =>
      Bootstrap.meanCi(Tables.load(s, dir, "events"), "event_type",
        "value", "event_id", BootReplicates)),

    // l-diversity of the length-bucket "sensitive" attribute under the
    // (lang, source) quasi-identifier.
    "q144_l_diversity" -> ((s, dir) =>
      Privacy.lDiversityReport(
        Tables.load(s, dir, "documents")
          .withColumn("len_bucket", expr("n_chars div 100")),
        Seq("lang", "source"), "len_bucket", DiversityL)))

  val oracleSql: Map[String, String] = Map(
    // The fold as a per-key recursive CTE over the row-numbered daily
    // series — identical integer updates, same first-argmax peak rule.
    "q142_cusum" ->
      """WITH RECURSIVE
        |d0 AS (SELECT event_type AS key, date_trunc('day', ts)::DATE AS day,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT key, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(y) // count(*) AS BIGINT) AS mu,
        |    CAST(((sum(y) // count(*)) * 50) // 1000 AS BIGINT) AS k
        |  FROM d0 GROUP BY key),
        |o AS (SELECT d0.*, row_number() OVER (PARTITION BY key ORDER BY day)
        |    AS rn FROM d0),
        |r AS (
        |  SELECT o.key, o.rn,
        |    greatest(0, o.y - st.mu - st.k) AS s,
        |    greatest(0, o.y - st.mu - st.k) AS smax,
        |    CASE WHEN greatest(0, o.y - st.mu - st.k) > 0 THEN o.day END
        |      AS peak
        |  FROM o JOIN st ON st.key = o.key WHERE o.rn = 1
        |  UNION ALL
        |  SELECT o.key, o.rn,
        |    greatest(0, r.s + o.y - st.mu - st.k),
        |    CASE WHEN greatest(0, r.s + o.y - st.mu - st.k) > r.smax
        |      THEN greatest(0, r.s + o.y - st.mu - st.k) ELSE r.smax END,
        |    CASE WHEN greatest(0, r.s + o.y - st.mu - st.k) > r.smax
        |      THEN o.day ELSE r.peak END
        |  FROM r JOIN o ON o.key = r.key AND o.rn = r.rn + 1
        |  JOIN st ON st.key = o.key)
        |SELECT st.key AS event_type, st.n_days, st.mu AS mu_floor,
        |  st.k AS slack, CAST(f.smax AS BIGINT) AS cusum_max,
        |  f.peak AS peak_day
        |FROM st JOIN r f ON f.key = st.key AND f.rn = st.n_days
        |ORDER BY event_type""".stripMargin,

    // Same Knuth hash, same frozen Poisson CDF thresholds; the oracle
    // affords the ×24 lateral blow-up the aggregate columns avoid.
    "q143_bootstrap_ci" ->
      """WITH v AS (SELECT event_type AS g, event_id AS id,
        |    CAST(round(value * 1e6) AS BIGINT) AS y FROM events),
        |w AS (SELECT g, b.b AS b, y,
        |    ((id * 24 + b.b) % 1000000007) * 2654435761 % 1000000007 AS h
        |  FROM v, range(0, 24) b(b)),
        |ww AS (SELECT g, b, y, CASE
        |    WHEN h < 367879443 THEN 0 WHEN h < 735758887 THEN 1
        |    WHEN h < 919698609 THEN 2 WHEN h < 981011849 THEN 3
        |    WHEN h < 996340160 THEN 4 ELSE 5 END AS wt FROM w),
        |r AS (SELECT g, b, CASE WHEN sum(wt) > 0
        |    THEN sum(wt * y) // sum(wt) END AS m FROM ww GROUP BY 1, 2),
        |a AS (SELECT g, array_agg(m ORDER BY m)
        |    FILTER (WHERE m IS NOT NULL) AS ms FROM r GROUP BY g),
        |t AS (SELECT g, count(*) AS n_rows, sum(y) AS sy FROM v GROUP BY g)
        |SELECT t.g AS event_type, CAST(t.n_rows AS BIGINT) AS n_rows,
        |  CAST(t.sy AS BIGINT) AS sum_micro,
        |  CAST(t.sy // t.n_rows AS BIGINT) AS mean_micro_floor,
        |  CASE WHEN len(a.ms) >= 3 THEN CAST(a.ms[2] AS BIGINT) END
        |    AS ci_lo_micro,
        |  CASE WHEN len(a.ms) >= 3 THEN CAST(a.ms[len(a.ms) - 1] AS BIGINT)
        |    END AS ci_hi_micro,
        |  CAST(24 - len(a.ms) AS INTEGER) AS n_dead
        |FROM t JOIN a ON a.g = t.g ORDER BY event_type""".stripMargin,

    "q144_l_diversity" ->
      s"""WITH c AS (SELECT lang, source, n_chars // 100 AS sv,
         |    count(*) AS c FROM documents GROUP BY 1, 2, 3)
         |SELECT lang, source, CAST(sum(c) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_sensitive,
         |  CAST(max(c) AS BIGINT) AS max_freq,
         |  count(*) < $DiversityL AS l_violation,
         |  count(*) = 1 AS homogeneous
         |FROM c GROUP BY lang, source ORDER BY lang, source""".stripMargin)
}
