package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, CorpusStats, Dedup, Pipeline, RangeJoin,
  Sessionize, TextOps, Winsorize}

/** Round-5 additions, part five — the remaining join/report shapes a
  * curation pipeline publishes: interval-overlap join (q92, the
  * interval×interval sibling of q63's point-in-interval form), vocabulary
  * coverage / OOV (q93), the filter-funnel attrition report (q94), as-of
  * join with tolerance (q95, merge_asof's `tolerance`), winsorized robust
  * stats (q96), and shingle-CONTAINMENT near-dup pairs (q97, the
  * asymmetric criterion symmetric Jaccard misses).
  *
  * Oracle conventions as in [[LlmQueries]]. Epoch conversions use
  * `floor(epoch(ts))` explicitly — DuckDB's `CAST(epoch(ts) AS BIGINT)`
  * ROUNDS the fractional second while Spark's `unix_timestamp` floors,
  * so the bare cast only matches when no boundary-straddling pair lands
  * within 1 s of a window edge.
  */
object Round5eQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** q92 session gap (2 h — shorter than q44's 12 h so sessions stay
    * hour-scale and the overlap relation is dense at the gate SF).
    */
  val OverlapGapSeconds = 7200L

  /** q92 hot-hour threshold: an (event_type, hour) cell is a "hot
    * window" when it holds at least this many events.
    */
  val HotMin = 5L

  val HourSeconds = 3600L

  /** q93 induced-vocabulary size — below the fixture's full vocabulary
    * at every SF, so OOV binds.
    */
  val VocabV = 20

  /** q94 funnel: the standard curation cascade (length band → language
    * allowlist → token floor → lexical-diversity floor).
    */
  val FunnelLangs = Seq("en", "de", "fr")
  val FunnelMinUniq = 0.35

  /** q95 as-of tolerance (4 h — invalidates ~92% of the unbounded q62
    * matches at the gate SF, so the tolerance path genuinely binds).
    */
  val AsofToleranceSeconds = 14400L

  /** q96 winsorization band. */
  val WinsorLo = 0.05
  val WinsorHi = 0.95

  /** q97 containment threshold (binds at 17 pairs at the gate SF,
    * including pairs whose symmetric Jaccard sits below the q33 cut).
    */
  val ContainmentTau = 0.4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Interval-overlap join: user sessions × hot (event_type, hour)
    // windows, keyless — the bin trick turns the would-be nested-loop
    // into an equi-join on the hour bin, and the canonical-meeting-bin
    // rule keeps each overlapping pair exactly once with no dedup.
    "q92_overlap_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val sess = Sessionize.assignSessions(ev, OverlapGapSeconds)
        .groupBy("user_id", "session_idx")
        .agg(unix_timestamp(min(col("ts"))).as("s_lo"),
          (unix_timestamp(max(col("ts"))) + 1L).as("s_hi"))
      val hot = ev
        .groupBy(col("event_type"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("w_lo"))
        .agg(count(lit(1)).as("n_events"))
        .filter(col("n_events") >= HotMin)
        .withColumn("w_hi", col("w_lo") + HourSeconds)
      RangeJoin.overlapJoin(sess, hot, Seq.empty,
          "s_lo", "s_hi", "w_lo", "w_hi", binWidth = HourSeconds)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_overlaps"),
          sum(least(col("s_hi"), col("w_hi"))
            - greatest(col("s_lo"), col("w_lo"))).as("sum_overlap_sec"))
        .orderBy("event_type")
    }),

    // Vocabulary coverage: corpus top-V vocab (deterministic order) →
    // broadcast membership → per-source OOV stat rows.
    "q93_vocab_coverage" -> ((s, dir) =>
      CorpusStats.vocabCoverage(docs(s, dir), VocabV)),

    // Filter-funnel attrition: one scan, one stat row, stack()ed into
    // per-stage (n_pass, n_drop) rows.
    "q94_filter_funnel" -> ((s, dir) => {
      val t = docs(s, dir).withColumn("__ws", TextOps.tokens(col("text")))
      Pipeline.filterFunnel(t, Seq(
        "chars" -> col("n_chars").between(100, 500),
        "lang" -> col("lang").isin(FunnelLangs.map(x => x: Any): _*),
        "tokens" -> (size(col("__ws")) >= 20),
        "uniq" -> when(size(col("__ws")) > 0,
          size(array_distinct(col("__ws"))).cast("double")
            / size(col("__ws")) >= FunnelMinUniq).otherwise(lit(false))))
        .orderBy("stage")
    }),

    // As-of with tolerance: q62's attribution, but a purchase older than
    // 4 h no longer matches. Same single shuffle+sort plan — tolerance is
    // a post-window predicate, never a re-search.
    "q95_asof_tolerance" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("p_event"),
          max_by(col("value"), col("event_id")).as("p_value"))
      AsOfJoin.asofLast(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("p_event", "p_value"),
        maxGapSeconds = Some(AsofToleranceSeconds))
        .orderBy("user_id", "event_id")
    }),

    // Winsorized per-source robust stats on n_chars: exact interpolated
    // p05/p95 bounds from the value histogram, micro-integer clamp.
    "q96_winsorized" -> ((s, dir) =>
      Winsorize.winsorizedStats(docs(s, dir), "source", "n_chars",
        WinsorLo, WinsorHi)
        .orderBy("source")),

    // Containment near-dup pairs, blocked by lang: directed overlap
    // fractions from the same one-explode shingle equi-join as q33.
    "q97_containment" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), "lang", ContainmentTau)
        .orderBy("doc_a", "doc_b")))

  private val tokSql = LlmQueries.tokSql

  /** Floored epoch seconds — Spark `unix_timestamp` parity (see class
    * doc).
    */
  private def epochSql(e: String): String =
    s"CAST(floor(epoch($e)) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "q92_overlap_join" ->
      s"""WITH g AS (SELECT user_id, event_id, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |s AS (SELECT user_id, ts,
         |    CASE WHEN prev_ts IS NULL
         |      OR date_diff('second', prev_ts, ts) > $OverlapGapSeconds
         |      THEN 1 ELSE 0 END AS new_s
         |  FROM g),
         |c AS (SELECT user_id, ts,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) AS sidx
         |  FROM s),
         |sess AS (SELECT user_id, sidx,
         |    ${epochSql("min(ts)")} AS s_lo, ${epochSql("max(ts)")} + 1 AS s_hi
         |  FROM c GROUP BY user_id, sidx),
         |hot AS (SELECT event_type,
         |    ${epochSql("date_trunc('hour', ts)")} AS w_lo,
         |    ${epochSql("date_trunc('hour', ts)")} + $HourSeconds AS w_hi
         |  FROM events GROUP BY 1, 2, 3 HAVING count(*) >= $HotMin),
         |ov AS (SELECT h.event_type,
         |    least(s.s_hi, h.w_hi) - greatest(s.s_lo, h.w_lo) AS ov_sec
         |  FROM sess s JOIN hot h ON s.s_lo < h.w_hi AND h.w_lo < s.s_hi)
         |SELECT event_type, count(*) AS n_overlaps,
         |  CAST(sum(ov_sec) AS BIGINT) AS sum_overlap_sec
         |FROM ov GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q93_vocab_coverage" ->
      s"""WITH tk AS (SELECT source AS g, unnest($tokSql) AS w FROM documents),
         |v AS (SELECT w FROM (SELECT w, count(*) AS c FROM tk GROUP BY w
         |  ORDER BY c DESC, w ASC LIMIT $VocabV)),
         |f AS (SELECT g,
         |    CASE WHEN w IN (SELECT w FROM v) THEN 0 ELSE 1 END AS oov
         |  FROM tk)
         |SELECT g AS source, count(*) AS n_tokens,
         |  CAST(sum(oov) AS BIGINT) AS n_oov,
         |  round(CAST(sum(oov) AS BIGINT) * 10000 / count(*), 4) AS oov_bp
         |FROM f GROUP BY g ORDER BY source""".stripMargin,

    "q94_filter_funnel" -> {
      val langs = FunnelLangs.map(l => s"'$l'").mkString(", ")
      s"""WITH t AS (SELECT n_chars, lang, $tokSql AS ws FROM documents),
         |f AS (SELECT (n_chars BETWEEN 100 AND 500) AS f1,
         |    (lang IN ($langs)) AS f2,
         |    (len(ws) >= 20) AS f3,
         |    (CASE WHEN len(ws) > 0
         |      THEN len(list_distinct(ws))::DOUBLE / len(ws) >= $FunnelMinUniq
         |      ELSE FALSE END) AS f4
         |  FROM t),
         |a AS (SELECT count(*) AS n0,
         |    count(*) FILTER (WHERE f1) AS n1,
         |    count(*) FILTER (WHERE f1 AND f2) AS n2,
         |    count(*) FILTER (WHERE f1 AND f2 AND f3) AS n3,
         |    count(*) FILTER (WHERE f1 AND f2 AND f3 AND f4) AS n4
         |  FROM f)
         |SELECT * FROM (
         |  SELECT 0 AS stage, 'input' AS name, n0 AS n_pass,
         |    CAST(0 AS BIGINT) AS n_drop FROM a
         |  UNION ALL SELECT 1, 'chars', n1, n0 - n1 FROM a
         |  UNION ALL SELECT 2, 'lang', n2, n1 - n2 FROM a
         |  UNION ALL SELECT 3, 'tokens', n3, n2 - n3 FROM a
         |  UNION ALL SELECT 4, 'uniq', n4, n3 - n4 FROM a)
         |ORDER BY stage""".stripMargin
    },

    "q95_asof_tolerance" ->
      s"""WITH c AS (SELECT user_id, event_id, ts FROM events
         |  WHERE event_type = 'click'),
         |p AS (SELECT user_id, ts, max(event_id) AS p_event,
         |    arg_max(value, event_id) AS p_value
         |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
         |SELECT c.user_id, c.event_id, c.ts, p.p_event, p.p_value
         |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
         |WHERE date_diff('second', p.ts, c.ts) <= $AsofToleranceSeconds
         |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q96_winsorized" ->
      s"""WITH b AS (SELECT source,
         |    quantile_cont(n_chars::DOUBLE, $WinsorLo) AS lo,
         |    quantile_cont(n_chars::DOUBLE, $WinsorHi) AS hi
         |  FROM documents GROUP BY source),
         |c AS (SELECT d.source, b.lo, b.hi,
         |    least(greatest(CAST(round(d.n_chars * 1000000.0) AS BIGINT),
         |        CAST(round(b.lo * 1000000.0) AS BIGINT)),
         |      CAST(round(b.hi * 1000000.0) AS BIGINT)) AS wq
         |  FROM documents d JOIN b USING (source))
         |SELECT source, count(*) AS n, round(lo, 4) AS lo, round(hi, 4) AS hi,
         |  CAST(sum(wq) AS BIGINT) AS wsum_micro,
         |  round(CAST(sum(wq) AS BIGINT) / count(*) / 1000000.0, 6) AS wmean
         |FROM c GROUP BY source, lo, hi ORDER BY source""".stripMargin,

    "q97_containment" -> {
      val roll = LlmQueries.rollSql("s")
      s"""WITH t AS (SELECT doc_id, lang, $tokSql AS ws FROM documents),
         |bg0 AS (SELECT doc_id, lang, ${LlmQueries.bigramsSql} AS sg FROM t),
         |bg AS (SELECT doc_id, lang,
         |  list_distinct(list_transform(sg, s -> $roll)) AS sh FROM bg0),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    len(list_intersect(a.sh, b.sh)) AS inter,
         |    len(a.sh) AS sza, len(b.sh) AS szb
         |  FROM bg a JOIN bg b ON a.lang = b.lang AND a.doc_id < b.doc_id),
         |c AS (SELECT doc_a, doc_b, inter,
         |    round(inter::DOUBLE / sza, 4) AS cont_a,
         |    round(inter::DOUBLE / szb, 4) AS cont_b
         |  FROM p WHERE inter > 0)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter, cont_a, cont_b
         |FROM c WHERE greatest(cont_a, cont_b) >= $ContainmentTau
         |ORDER BY doc_a, doc_b""".stripMargin
    })
}
