package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ProfileDrift, SkewReport, Standardize, TimeSeries}

/** Round-5 additions, part six — the monitoring/diagnostic shapes that
  * close the loop between profiling and the engine's own scale remedies:
  * PSI distribution drift between snapshots (q98, the full-distribution
  * upgrade of scalar stat tracking), rolling calendar-window activity
  * incl. rolling DISTINCT (q99), join-key skew census (q100 — the
  * measurement side of the q46 salting and the dedup bucket caps), and
  * per-group z-score standardization (q101).
  *
  * Oracle conventions as in [[LlmQueries]]: integer quantization before
  * order-dependent sums (nano-nats for PSI, micro-points for rolling
  * value sums), round-before-compare for stddev-derived scores, and
  * DATE columns cast to ISO strings on both sides.
  */
object Round5fQueries {

  /** q98 snapshot cut: mid-range of the fixture's 30-day event window,
    * so both sides hold real mass at every SF.
    */
  val PsiCutoff = "2024-01-16"
  val PsiBins = 10

  /** q99 rolling window — the standard weekly-active shape. */
  val RollDays = 7

  /** q100 heavy-key census size. */
  val SkewTopN = 20

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PSI drift on purchase/click/... values across the mid-month cut.
    "q98_psi_drift" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cut = lit(PsiCutoff).cast("timestamp")
      ProfileDrift.psiReport(ev.filter(col("ts") < cut),
        ev.filter(col("ts") >= cut), "event_type", "value", PsiBins)
    }),

    // Daily + rolling-7d activity; day serialized to ISO for the oracle.
    "q99_rolling_activity" -> ((s, dir) =>
      TimeSeries.rollingActivity(Tables.load(s, dir, "events"), RollDays)
        .withColumn("day", col("day").cast("string"))
        .orderBy("day")),

    // Heavy-key census on the orders→customer join key.
    "q100_key_skew" -> ((s, dir) =>
      SkewReport.keySkew(Tables.load(s, dir, "orders"), "o_custkey",
        SkewTopN)),

    // Per-source length z-scores over the corpus.
    "q101_zscore" -> ((s, dir) =>
      Standardize.zScore(Tables.load(s, dir, "documents"), "source",
        "n_chars")
        .select("doc_id", "source", "n_chars", "z")
        .orderBy("doc_id")))

  val oracleSql: Map[String, String] = Map(
    "q98_psi_drift" -> {
      val half = PsiBins / 2.0
      def share(c: String, n: String) = s"(($c + 0.5) / ($n + $half))"
      val p = share("c_ref", "n_ref")
      val q = share("c_cur", "n_cur")
      s"""WITH r AS (SELECT event_type AS g, value AS v FROM events
         |    WHERE ts < TIMESTAMP '$PsiCutoff' AND value IS NOT NULL),
         |c AS (SELECT event_type AS g, value AS v FROM events
         |    WHERE ts >= TIMESTAMP '$PsiCutoff' AND value IS NOT NULL),
         |b AS (SELECT g, min(v) AS lo,
         |    (max(v) - min(v)) / $PsiBins AS width FROM r GROUP BY g),
         |hr AS (SELECT r.g,
         |    CASE WHEN b.width > 0 THEN least(${PsiBins - 1}, greatest(0,
         |      CAST(floor((r.v - b.lo) / b.width) AS INTEGER)))
         |    ELSE 0 END AS bucket, count(*) AS c_ref
         |  FROM r JOIN b USING (g) GROUP BY 1, 2),
         |hc AS (SELECT c.g,
         |    CASE WHEN b.width > 0 THEN least(${PsiBins - 1}, greatest(0,
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
         |SELECT g AS event_type, n_ref, n_cur,
         |  round(sum(nano) / 1000000000.0, 6) AS psi
         |FROM k GROUP BY g, n_ref, n_cur ORDER BY event_type""".stripMargin
    },

    "q99_rolling_activity" ->
      s"""WITH base AS (SELECT CAST(ts AS DATE) AS day, user_id AS u,
         |    CAST(round(value * 1000000.0) AS BIGINT) AS vm FROM events),
         |daily AS (SELECT day, count(*) AS n_events, sum(vm) AS vm
         |  FROM base GROUP BY day),
         |du AS (SELECT DISTINCT day, u FROM base),
         |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
         |roll AS (SELECT d.day,
         |    CAST(sum(x.n_events) AS BIGINT) AS n_events_roll,
         |    round(sum(x.vm) / 1000000.0, 4) AS value_roll
         |  FROM daily d JOIN daily x
         |    ON x.day BETWEEN d.day - ${RollDays - 1} AND d.day
         |  GROUP BY d.day),
         |wau AS (SELECT d.day, count(DISTINCT x.u) AS wau
         |  FROM daily d JOIN du x
         |    ON x.day BETWEEN d.day - ${RollDays - 1} AND d.day
         |  GROUP BY d.day)
         |SELECT CAST(d.day AS VARCHAR) AS day, dau.dau, d.n_events,
         |  wau.wau, roll.n_events_roll, roll.value_roll
         |FROM daily d
         |JOIN dau ON dau.day = d.day
         |JOIN wau ON wau.day = d.day
         |JOIN roll ON roll.day = d.day
         |ORDER BY day""".stripMargin,

    "q100_key_skew" ->
      s"""WITH c AS (SELECT o_custkey AS key, count(*) AS cnt
         |  FROM orders GROUP BY 1),
         |t AS (SELECT sum(cnt) AS total FROM c),
         |top AS (SELECT key, cnt FROM c
         |  ORDER BY cnt DESC, key ASC LIMIT $SkewTopN),
         |r AS (SELECT key, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank,
         |    sum(cnt) OVER (ORDER BY cnt DESC, key ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM top)
         |SELECT r.rank, r.key, r.cnt,
         |  round(r.cnt * 10000.0 / t.total, 4) AS share_bp,
         |  round(r.cum * 10000.0 / t.total, 4) AS cum_bp
         |FROM r, t ORDER BY rank""".stripMargin,

    "q101_zscore" ->
      """WITH s AS (SELECT source,
        |    round(avg(CAST(n_chars AS DOUBLE)), 6) AS mu,
        |    round(stddev_samp(CAST(n_chars AS DOUBLE)), 6) AS sigma
        |  FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  CASE WHEN s.sigma > 0
        |    THEN round((CAST(d.n_chars AS DOUBLE) - s.mu) / s.sigma, 4)
        |  END AS z
        |FROM documents d JOIN s USING (source)
        |ORDER BY d.doc_id""".stripMargin)
}
