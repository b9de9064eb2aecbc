package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Preference

/** Round-8 part nine: pairwise-preference analytics (the RLHF data
  * shapes) — Bradley–Terry strengths over the user-level matchup
  * census, Wilson-bounded win rates, McNemar's paired change test,
  * and Fleiss' multi-rater agreement.
  */
object Round8iQueries {

  /** MM rounds for the Bradley–Terry fit (unrolled in the oracle). */
  val BtRounds = 2

  /** Fixed panel size for Fleiss' κ: each user's first 4 events. */
  val FleissRaters = 4

  /** Mid-window cut for the McNemar before/after pairing. */
  val McnemarCut = "2024-01-16 00:00:00"

  private def matchups(s: SparkSession, dir: String): DataFrame =
    Preference.matchupCensus(Tables.load(s, dir, "events"),
      "user_id", "event_type", "value")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Strengths from "which event type carries more value per user" —
    // the Bradley-Terry read of the pairwise-preference census.
    "q244_bradley_terry" -> ((s, dir) =>
      Preference.bradleyTerry(matchups(s, dir), BtRounds)),

    // Did the per-user error incidence CHANGE between the window's
    // halves — the within-subject test on the discordant users only.
    "q245_mcnemar" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cut = lit(McnemarCut).cast("timestamp")
      val isErr = col("event_type") === "error"
      val paired = ev.groupBy("user_id").agg(
        (sum(when(isErr && col("ts") < cut, 1L).otherwise(0L)) > 0)
          .as("a"),
        (sum(when(isErr && col("ts") >= cut, 1L).otherwise(0L)) > 0)
          .as("b"))
      Preference.mcnemar(paired, "a", "b")
    }),

    // Multi-rater agreement over each user's first-4-event panel:
    // do a user's early events "vote" for one event type.
    "q246_fleiss_kappa" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val ratings = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= FleissRaters)
      Preference.fleissKappa(ratings, "user_id", "event_type",
        FleissRaters)
    }),

    // The ordered win-rate matrix with Wilson bounds — the honest
    // per-pair read underneath the q244 strengths.
    "q247_win_rate_wilson" -> ((s, dir) =>
      Preference.winRateMatrix(
        graft.util.Caches.cached(matchups(s, dir)))))

  /** Shared oracle CTE: the matchup census over events. */
  private val MatchupSql =
    """um AS (SELECT user_id AS u, event_type AS it,
      |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
      |      AS sv
      |  FROM events GROUP BY 1, 2),
      |pr AS (SELECT a.it AS item_a, b.it AS item_b,
      |    CAST(sum(CASE WHEN a.sv > b.sv THEN 1 ELSE 0 END)
      |      AS BIGINT) AS wins_a,
      |    CAST(sum(CASE WHEN a.sv < b.sv THEN 1 ELSE 0 END)
      |      AS BIGINT) AS wins_b,
      |    CAST(sum(CASE WHEN a.sv = b.sv THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ties
      |  FROM um a JOIN um b ON a.u = b.u AND a.it < b.it
      |  GROUP BY 1, 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q244_bradley_terry" -> {
      // two MM rounds unrolled; every division a positive HUGEINT `//`
      val s = "1000000000000"
      def round(i: Int): String =
        s"""d$i AS (SELECT g.i,
           |    sum((CAST(g.n AS HUGEINT) * $s) // (wi.w + wj.w)) AS d
           |  FROM g JOIN w${i - 1} wi ON wi.i = g.i
           |    JOIN w${i - 1} wj ON wj.i = g.j GROUP BY 1),
           |r$i AS (SELECT it.i, (it.wins * $s) // d$i.d AS r
           |  FROM it JOIN d$i ON d$i.i = it.i),
           |w$i AS (SELECT i,
           |    (r * (SELECT k FROM k) * 1000000) //
           |      (SELECT sum(r) FROM r$i) AS w FROM r$i)""".stripMargin
      s"""WITH $MatchupSql,
         |g AS (SELECT item_a AS i, item_b AS j, wins_a + wins_b AS n,
         |    wins_a AS w FROM pr WHERE wins_a + wins_b > 0
         |  UNION ALL SELECT item_b, item_a, wins_a + wins_b, wins_b
         |  FROM pr WHERE wins_a + wins_b > 0),
         |it AS (SELECT i, CAST(sum(w) AS HUGEINT) AS wins,
         |    CAST(sum(n) AS BIGINT) AS games FROM g GROUP BY 1),
         |k AS (SELECT CAST(count(*) AS HUGEINT) AS k FROM it),
         |w0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS w FROM it),
         |${round(1)},
         |${round(2)}
         |SELECT it.i AS item, CAST(it.wins AS BIGINT) AS wins,
         |  it.games AS games, CAST(w2.w AS BIGINT) AS strength_micro,
         |  CAST(row_number() OVER (ORDER BY w2.w DESC, it.i)
         |    AS BIGINT) AS rank
         |FROM it JOIN w2 ON w2.i = it.i ORDER BY rank""".stripMargin
    },

    "q245_mcnemar" ->
      s"""WITH p AS (SELECT user_id,
         |    sum(CASE WHEN event_type = 'error' AND
         |      ts < TIMESTAMP '$McnemarCut' THEN 1 ELSE 0 END) > 0
         |      AS a,
         |    sum(CASE WHEN event_type = 'error' AND
         |      ts >= TIMESTAMP '$McnemarCut' THEN 1 ELSE 0 END) > 0
         |      AS b
         |  FROM events GROUP BY 1),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a_only,
         |    CAST(sum(CASE WHEN b AND NOT a THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b_only,
         |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_both,
         |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_neither
         |  FROM p)
         |SELECT n, a_only, b_only, n_both, n_neither,
         |  CASE WHEN a_only + b_only > 0 THEN
         |    round((abs(a_only - b_only)::DOUBLE - 1.0) *
         |      (abs(a_only - b_only)::DOUBLE - 1.0) /
         |      (a_only + b_only)::DOUBLE, 6) END AS chi2_cc
         |FROM c""".stripMargin,

    "q246_fleiss_kappa" ->
      s"""WITH r AS (SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn FROM events),
         |cen AS (SELECT user_id AS item, event_type AS cat,
         |    CAST(count(*) AS BIGINT) AS c FROM r
         |  WHERE rn <= $FleissRaters GROUP BY 1, 2),
         |keep AS (SELECT cen.* FROM cen JOIN (SELECT item FROM cen
         |    GROUP BY item HAVING sum(c) = $FleissRaters) k
         |  USING (item)),
         |bc AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
         |    CAST(sum(CAST(s_c AS HUGEINT) * s_c) AS HUGEINT)
         |      AS pe_num
         |  FROM (SELECT cat, CAST(sum(c) AS BIGINT) AS s_c FROM keep
         |    GROUP BY 1)),
         |bi AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |    CAST(sum(sq) AS HUGEINT) AS sq_sum
         |  FROM (SELECT item, sum(CAST(c AS HUGEINT) * c) AS sq
         |    FROM keep GROUP BY 1)),
         |o AS (SELECT n_items, CAST($FleissRaters AS BIGINT)
         |      AS n_raters, n_categories,
         |    round((sq_sum::DOUBLE - n_items::DOUBLE *
         |        $FleissRaters.0) /
         |      (n_items::DOUBLE * $FleissRaters.0 *
         |        ($FleissRaters.0 - 1.0)), 6) AS p_observed,
         |    round(pe_num::DOUBLE /
         |      (n_items::DOUBLE * $FleissRaters.0 *
         |        n_items::DOUBLE * $FleissRaters.0), 6) AS p_expected
         |  FROM bi, bc)
         |SELECT n_items, n_raters, n_categories, p_observed,
         |  p_expected,
         |  CASE WHEN p_expected < 1.0 THEN
         |    round((p_observed - p_expected) / (1.0 - p_expected), 6)
         |  END AS kappa
         |FROM o""".stripMargin,

    "q247_win_rate_wilson" ->
      s"""WITH $MatchupSql,
         |b AS (SELECT item_a AS item, item_b AS opponent,
         |    wins_a AS wins, wins_a + wins_b AS n FROM pr
         |  UNION ALL SELECT item_b, item_a, wins_b, wins_a + wins_b
         |  FROM pr)
         |SELECT item, opponent, wins, n AS n_decisions,
         |  (wins * 1000000) // n AS win_rate_ppm,
         |  round((wins::DOUBLE / n::DOUBLE +
         |      (1.96 * 1.96) / (2.0 * n::DOUBLE)) /
         |      (1.0 + (1.96 * 1.96) / n::DOUBLE) -
         |    (1.96 * sqrt(wins::DOUBLE / n::DOUBLE *
         |        (1.0 - wins::DOUBLE / n::DOUBLE) / n::DOUBLE +
         |        (1.96 * 1.96) / (4.0 * n::DOUBLE * n::DOUBLE))) /
         |      (1.0 + (1.96 * 1.96) / n::DOUBLE), 6) AS wilson_lo,
         |  round((wins::DOUBLE / n::DOUBLE +
         |      (1.96 * 1.96) / (2.0 * n::DOUBLE)) /
         |      (1.0 + (1.96 * 1.96) / n::DOUBLE) +
         |    (1.96 * sqrt(wins::DOUBLE / n::DOUBLE *
         |        (1.0 - wins::DOUBLE / n::DOUBLE) / n::DOUBLE +
         |        (1.96 * 1.96) / (4.0 * n::DOUBLE * n::DOUBLE))) /
         |      (1.0 + (1.96 * 1.96) / n::DOUBLE), 6) AS wilson_hi
         |FROM b WHERE n > 0 ORDER BY item, opponent""".stripMargin)
}
