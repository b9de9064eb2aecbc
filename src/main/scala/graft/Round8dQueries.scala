package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Graph, Transitions}

/** Round-8 part four: label-propagation communities, the Brier
  * decomposition, and Markov removal-effect attribution.
  */
object Round8dQueries {

  val LpaRounds = 4
  val RemovalSteps = 6
  val BrierBins = 10

  /** Min-max normalized micro-probability forecast off the event value
    * (the deterministic stand-in for a model score — one broadcast
    * stat row, exact integer arithmetic).
    */
  private def probMicro(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.load(s, dir, "events")
      .select(round(col("value") * 1e6).cast("long").as("vm"),
        col("event_type"))
    val mm = b.agg(min("vm").as("mn"), max("vm").as("mx"))
    b.crossJoin(broadcast(mm))
      .select(expr("((vm - mn) * 1000000) div (mx - mn + 1)").as("pm"),
        col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic synchronous LPA over the co-purchase graph: 4
    // rounds, (count desc, label asc) tie order — unrolled-SQL-exact.
    "q228_label_propagation" -> ((s, dir) =>
      Graph.labelPropagation(Round6bQueries.coPurchase(s, dir),
        LpaRounds)),

    // Murphy decomposition of the Brier score for the value-derived
    // forecast of "this event is a purchase".
    "q229_brier" -> ((s, dir) =>
      Evaluation.brierReport(probMicro(s, dir), "pm",
        col("event_type") === "purchase", BrierBins)),

    // Removal-effect attribution over purchase journeys: channel
    // credit = absorption-probability drop when the channel's node
    // redirects to ~null. All variants propagate together.
    "q230_removal_effect" -> ((s, dir) =>
      Transitions.removalEffect(Tables.load(s, dir, "events"),
        "purchase", RemovalSteps)))

  val oracleSql: Map[String, String] = Map(
    "q228_label_propagation" -> {
      def step(k: Int) =
        s"""vt$k AS (SELECT e.dst AS node, p.lbl,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM ed e JOIN lb${k - 1} p ON p.node = e.src
           |  GROUP BY 1, 2),
           |lb$k AS (SELECT node, lbl FROM (SELECT node, lbl,
           |    row_number() OVER (PARTITION BY node
           |      ORDER BY c DESC, lbl ASC) AS rn FROM vt$k)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH ${Round6bQueries.edgesSql},
         |lb0 AS (SELECT node, node AS lbl FROM dg),
         |${(1 to LpaRounds).map(step).mkString(",\n")},
         |sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
         |  FROM lb$LpaRounds GROUP BY 1)
         |SELECT l.node, CAST(l.lbl AS BIGINT) AS community,
         |  sz.community_size
         |FROM lb$LpaRounds l JOIN sz ON sz.lbl = l.lbl
         |ORDER BY l.node""".stripMargin
    },

    "q229_brier" ->
      s"""WITH b AS (SELECT CAST(round(value * 1e6) AS BIGINT) AS vm,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |mx AS (SELECT min(vm) AS mn, max(vm) AS mx FROM b),
         |v AS (SELECT ((vm - mn) * 1000000) // (mx - mn + 1) AS pm,
         |    CAST(y AS BIGINT) AS y FROM b, mx),
         |v2 AS (SELECT pm, y, (pm * $BrierBins) // 1000001 AS bin
         |  FROM v),
         |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
         |    CAST(sum(pm) // count(*) AS BIGINT) AS fbar,
         |    CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS obar
         |  FROM v2 GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS n_pos,
         |    CAST(sum(CAST((pm - y * 1000000) * (pm - y * 1000000)
         |      AS HUGEINT)) AS HUGEINT) AS bsum,
         |    CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS obar_all
         |  FROM v2),
         |parts AS (SELECT CAST(count(*) AS BIGINT) AS n_bins_used,
         |    CAST(sum(CAST(n_k AS HUGEINT) * (fbar - obar)
         |      * (fbar - obar)) AS HUGEINT) AS rel_num,
         |    CAST(sum(CAST(n_k AS HUGEINT) * (obar - obar_all)
         |      * (obar - obar_all)) AS HUGEINT) AS res_num
         |  FROM bins, tot)
         |SELECT n, n_pos, n_bins_used,
         |  round(bsum::DOUBLE / (n::DOUBLE * 1e12), 6) AS brier,
         |  round(rel_num::DOUBLE / (n::DOUBLE * 1e12), 6)
         |    AS reliability,
         |  round(res_num::DOUBLE / (n::DOUBLE * 1e12), 6)
         |    AS resolution,
         |  round(obar_all::DOUBLE * (1e6 - obar_all::DOUBLE) / 1e12, 6)
         |    AS uncertainty
         |FROM tot, parts""".stripMargin,

    "q230_removal_effect" -> {
      def step(k: Int) =
        s"""w$k AS (SELECT stt.v, stt.s,
           |    CASE WHEN stt.s = '~conv' THEN 1000000
           |      WHEN stt.s = '~null' THEN 0
           |      ELSE coalesce(a.agg, 0) END AS val
           |  FROM stt LEFT JOIN (
           |    SELECT vm.v, vm.f AS s,
           |      sum(vm.p * pv.val) // 1000000 AS agg
           |    FROM vm JOIN w${k - 1} pv
           |      ON pv.v = vm.v AND pv.s = vm.t
           |    GROUP BY 1, 2) a ON a.v = stt.v AND a.s = stt.s)"""
          .stripMargin
      s"""WITH ev AS (SELECT user_id AS u, event_type AS s, ts,
         |    event_id AS e FROM events),
         |cv AS (SELECT u, ts AS cts, e AS ce FROM (
         |    SELECT u, ts, e, row_number() OVER (PARTITION BY u
         |      ORDER BY ts, e) AS rn FROM ev WHERE s = 'purchase')
         |  WHERE rn = 1),
         |j AS (SELECT ev.u, ev.s, cv.cts IS NOT NULL AS has_conv,
         |    row_number() OVER (PARTITION BY ev.u
         |      ORDER BY ev.ts, ev.e) AS rn,
         |    count(*) OVER (PARTITION BY ev.u) AS nmax,
         |    lag(ev.s) OVER (PARTITION BY ev.u
         |      ORDER BY ev.ts, ev.e) AS prev
         |  FROM ev LEFT JOIN cv ON cv.u = ev.u
         |  WHERE cv.u IS NULL OR ev.ts < cv.cts
         |    OR (ev.ts = cv.cts AND ev.e < cv.ce)),
         |tr AS (
         |  SELECT prev AS f, s AS t FROM j WHERE rn >= 2
         |  UNION ALL SELECT '~start', s FROM j WHERE rn = 1
         |  UNION ALL SELECT s, CASE WHEN has_conv THEN '~conv'
         |    ELSE '~null' END FROM j WHERE rn = nmax
         |  UNION ALL SELECT '~start', '~conv' FROM cv
         |    WHERE u NOT IN (SELECT DISTINCT u FROM j)),
         |mm AS (SELECT f, t, CAST(count(*) AS BIGINT) AS n FROM tr
         |  GROUP BY 1, 2),
         |m AS (SELECT f, t, (n * 1000000) //
         |    sum(n) OVER (PARTITION BY f) AS p FROM mm),
         |ch AS (SELECT DISTINCT f AS c FROM m WHERE f <> '~start'),
         |vm AS (SELECT v, f, t, CAST(sum(p) AS BIGINT) AS p FROM (
         |    SELECT '~full' AS v, f, t, p FROM m
         |    UNION ALL
         |    SELECT ch.c, m.f, CASE WHEN m.t = ch.c THEN '~null'
         |      ELSE m.t END, m.p
         |    FROM m JOIN ch ON m.f <> ch.c) GROUP BY 1, 2, 3),
         |stt AS (SELECT DISTINCT v, s FROM (SELECT v, f AS s FROM vm
         |    UNION ALL SELECT v, t FROM vm)),
         |w0 AS (SELECT v, s, CASE WHEN s = '~conv' THEN 1000000
         |    ELSE 0 END AS val FROM stt),
         |${(1 to RemovalSteps).map(step).mkString(",\n")},
         |res AS (SELECT v, val FROM w$RemovalSteps
         |  WHERE s = '~start'),
         |pf AS (SELECT val AS pfull FROM res WHERE v = '~full'),
         |per AS (SELECT v AS channel, pfull, val,
         |    pfull - val AS rem FROM res, pf WHERE v <> '~full'),
         |tt AS (SELECT CAST(sum(rem) AS BIGINT) AS rtot FROM per)
         |SELECT channel, CAST(pfull AS BIGINT) AS p_conv_full_micro,
         |  CAST(val AS BIGINT) AS p_conv_removed_micro,
         |  CASE WHEN pfull > 0 THEN CAST((rem * 1000000) // pfull
         |    AS BIGINT) END AS removal_effect_ppm,
         |  CASE WHEN rtot > 0 THEN CAST((rem * 1000000) // rtot
         |    AS BIGINT) END AS share_ppm
         |FROM per, tt ORDER BY channel""".stripMargin
    })
}
