package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Attribution, CorpusConfig, Transitions}

/** Round-8 part five: followed-by census, exact Shapley attribution,
  * Adamic–Adar link prediction.
  */
object Round8eQueries {

  val AaTopK = 50

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gap-tolerant "a then eventually b" census with lift vs the
    // independence baseline — funnel discovery over the event log.
    "q231_followed_by" -> ((s, dir) =>
      Transitions.followedByCensus(Tables.load(s, dir, "events"))),

    // Exact Shapley channel credit over purchase journeys: coalition
    // value = observed conversion rate of the exact touched set.
    "q232_shapley_attribution" -> ((s, dir) =>
      Attribution.shapleyAttribution(Tables.load(s, dir, "events"),
        "purchase")),

    // Top-50 missing-edge candidates on the co-purchase graph by
    // Adamic-Adar (rare shared neighbors say more than hubs) — the
    // EXACT tier: every common neighbor counts.
    "q233_adamic_adar" -> ((s, dir) =>
      CorpusConfig.Exact.adamicAdarTopK(
        Round6bQueries.coPurchase(s, dir), AaTopK)),

    // Production tier: wedge centers above the cap drop BEFORE the
    // deg² fan-out. On this dense graph the cap BINDS (different
    // top-50 than q233) — a semantic scale knob, oracle-pinned.
    "q233a_adamic_adar_capped" -> ((s, dir) =>
      CorpusConfig.Production.adamicAdarTopK(
        Round6bQueries.coPurchase(s, dir), AaTopK)))

  val oracleSql: Map[String, String] = Map(
    "q231_followed_by" ->
      """WITH pos AS (SELECT user_id AS key, event_type AS state,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS pos
        |  FROM events),
        |per AS (SELECT key, state, min(pos) AS fp, max(pos) AS lp
        |  FROM pos GROUP BY 1, 2),
        |nk AS (SELECT CAST(count(DISTINCT key) AS BIGINT) AS n_keys
        |  FROM per),
        |tt AS (SELECT state, CAST(count(*) AS BIGINT) AS n_with
        |  FROM per GROUP BY 1),
        |pr AS (SELECT a.state AS type_a, b.state AS type_b,
        |    CAST(sum(CASE WHEN a.fp < b.lp THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ab
        |  FROM per a JOIN per b ON a.key = b.key
        |    AND a.state <> b.state
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_keys, ta.n_with AS n_a,
        |  tb.n_with AS n_b, n_ab,
        |  CAST((n_ab * 1000000) // ta.n_with AS BIGINT)
        |    AS followed_ppm,
        |  CAST((CAST(n_ab AS HUGEINT) * n_keys * 1000000) //
        |    (CAST(ta.n_with AS HUGEINT) * tb.n_with) AS BIGINT)
        |    AS lift_ppm
        |FROM pr JOIN tt ta ON ta.state = type_a
        |  JOIN tt tb ON tb.state = type_b, nk
        |ORDER BY type_a, type_b""".stripMargin,

    "q232_shapley_attribution" ->
      """WITH ev AS (SELECT user_id AS u, event_type AS s, ts,
        |    event_id AS e FROM events),
        |cv AS (SELECT u, ts AS cts, e AS ce FROM (
        |    SELECT u, ts, e, row_number() OVER (PARTITION BY u
        |      ORDER BY ts, e) AS rn FROM ev WHERE s = 'purchase')
        |  WHERE rn = 1),
        |tj AS (SELECT DISTINCT ev.u, ev.s, cv.cts IS NOT NULL AS conv
        |  FROM ev LEFT JOIN cv ON cv.u = ev.u
        |  WHERE cv.u IS NULL OR ev.ts < cv.cts
        |    OR (ev.ts = cv.cts AND ev.e < cv.ce)),
        |ci AS (SELECT s, CAST(row_number() OVER (ORDER BY s) - 1
        |    AS INTEGER) AS idx FROM (SELECT DISTINCT s FROM tj)),
        |kk AS (SELECT CAST(count(*) AS INTEGER) AS k FROM ci),
        |mk AS (SELECT u, conv,
        |    CAST(sum(CAST(1 AS BIGINT) << idx) AS BIGINT) AS mask
        |  FROM tj JOIN ci USING (s) GROUP BY 1, 2
        |  UNION ALL SELECT cv.u, true, 0 FROM cv
        |    WHERE cv.u NOT IN (SELECT DISTINCT u FROM tj)),
        |coal AS (SELECT mask, CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_conv FROM mk GROUP BY 1),
        |cvv AS (SELECT mask, (n_conv * 1000000) // n_keys AS v
        |  FROM coal),
        |ss AS (SELECT CAST(u.i AS BIGINT) AS ss
        |  FROM kk, unnest(range(0, CAST(1 AS BIGINT) << k)) u(i)),
        |pr AS (SELECT ci.s AS channel, ss.ss,
        |    ss.ss + (CAST(1 AS BIGINT) << idx) AS sc,
        |    CAST(bit_count(ss.ss) AS INTEGER) AS sz
        |  FROM ss, ci WHERE (ss.ss & (CAST(1 AS BIGINT) << idx)) = 0),
        |wv AS (SELECT pr.channel,
        |    CAST(factorial(pr.sz) * factorial(kk.k - 1 - pr.sz)
        |      AS HUGEINT) AS w,
        |    CAST(coalesce(va.v, 0) - coalesce(vb.v, 0) AS BIGINT)
        |      AS dv
        |  FROM pr CROSS JOIN kk
        |  LEFT JOIN cvv vb ON vb.mask = pr.ss
        |  LEFT JOIN cvv va ON va.mask = pr.sc),
        |ph AS (SELECT channel, CAST(sum(w * dv) AS HUGEINT) AS num
        |  FROM wv GROUP BY 1),
        |st AS (SELECT s AS channel,
        |    CAST(count(*) AS BIGINT) AS n_keys_touched,
        |    CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_conv_touched
        |  FROM tj GROUP BY 1)
        |SELECT st.channel, n_keys_touched, n_conv_touched,
        |  CAST(ph.num // CAST(factorial(kk.k) AS HUGEINT) AS BIGINT)
        |    AS shapley_micro
        |FROM st JOIN ph ON ph.channel = st.channel, kk
        |ORDER BY st.channel""".stripMargin,

    "q233_adamic_adar" -> aaSql(None),
    "q233a_adamic_adar_capped" ->
      aaSql(CorpusConfig.Production.graphWedgeCap))

  /** AA oracle at a wedge-cap tier (None = exact). */
  private def aaSql(cap: Option[Long]): String = {
    val capPred = cap.map(c => s" AND deg <= $c").getOrElse("")
    s"""WITH ${Round6bQueries.edgesSql},
       |ctr AS (SELECT node AS z,
       |    CAST(round(1000000.0 / ln(deg)) AS BIGINT) AS c
       |  FROM dg WHERE deg >= 2$capPred),
       |adj AS (SELECT ed.src AS z, ed.dst AS n, ctr.c
       |  FROM ed JOIN ctr ON ctr.z = ed.src),
       |cand AS (SELECT x.n AS node_a, y.n AS node_b,
       |    CAST(count(*) AS BIGINT) AS n_common,
       |    CAST(sum(x.c) AS BIGINT) AS aa_score_micro
       |  FROM adj x JOIN adj y ON x.z = y.z AND x.n < y.n
       |  GROUP BY 1, 2),
       |ne AS (SELECT na AS node_a, nb AS node_b FROM e0
       |  UNION SELECT nb, na FROM e0)
       |SELECT c.node_a, c.node_b, n_common, aa_score_micro
       |FROM cand c ANTI JOIN ne
       |  ON ne.node_a = c.node_a AND ne.node_b = c.node_b
       |ORDER BY aa_score_micro DESC, c.node_a, c.node_b
       |LIMIT $AaTopK""".stripMargin
  }
}
