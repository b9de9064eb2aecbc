package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Similarity}

/** Round-9 part three: split-conformal prediction (distribution-free
  * interval calibration with held-out coverage) and MMR diversified
  * rerank (Carbonell & Goldstein 1998 — the diversity-aware top-k a
  * RAG context builder wants where plain top-k returns near-copies).
  */
object Round9fQueries {

  val MmrK = 5
  val MmrPool = 20
  val MmrLambda = 700L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Diversity-aware top-5 from a 20-candidate pool, λ = 0.7.
    "q268_mmr_rerank" -> ((s, dir) =>
      Similarity.mmrRerank(Tables.load(s, dir, "embeddings"),
        Round3Queries.AnnQueryIds, MmrK, MmrPool, MmrLambda)),

    // q160's cumulative-hazard twin: same severe-error lifetimes,
    // H(t) = Σ d/n in exact floor micro — no ln/exp ULP exposure.
    "q269_nelson_aalen" -> ((s, dir) =>
      graft.operators.Survival.nelsonAalen(Tables.load(s, dir, "events"),
        col("event_type") === "error" && col("value") > 150)),

    // The stream-stream interval join's BATCH twin (watermarks no-op):
    // every purchase within the hour before each click. Oracled here;
    // the streaming form + kill-restart ≡ this relation is Round9bSpec.
    "q272_interval_join" -> ((s, dir) =>
      graft.streaming.StreamingOps.intervalJoinStream(
        Tables.load(s, dir, "events")
          .select(col("user_id").cast("long"), col("ts"),
            col("event_type"), col("event_id").cast("long"),
            col("value").cast("double")),
        window = "1 hour")
        .orderBy("user_id", "click_id", "p_event")),

    // Does "per-type mean value" cover at the promised 90%? q̂ from the
    // odd-user calibration half, coverage on the even-user half.
    "q267_conformal" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type").as("g"),
          (col("user_id") % 2 === 1).as("cal"),
          round(col("value").cast("double") * 1e6).cast("long").as("vm"))
      // sign split off before the floor division (house idiom, see
      // topEigenReport): Spark `div` truncates toward zero, DuckDB `//`
      // floors — they agree only on non-negative operands, and a group
      // whose calibration sum went negative would otherwise shift yhat
      // by one micro between the engines
      val means = ev.filter(col("cal")).groupBy("g")
        .agg(expr("(case when sum(vm) < 0 then -1 else 1 end) * " +
          "(abs(cast(sum(vm) as decimal(38,0))) div count(1))")
          .as("yhat"))
      Evaluation.splitConformal(ev.join(broadcast(means), Seq("g")),
        col("cal"), col("vm"), col("yhat"))
    }))

  /** One greedy MMR step: the (score desc, vec_id) argmax over the
    * candidates not yet selected, scored against sel{t-1}. */
  private def mmrStep(t: Int): String = {
    val lam = MmrLambda
    s"""rem$t AS (SELECT c.* FROM cand c LEFT JOIN sel${t - 1} s
       |  ON s.query_id = c.query_id AND s.vec_id = c.vec_id
       |  WHERE s.vec_id IS NULL),
       |ms$t AS (SELECT c.query_id, c.vec_id, c.rel, max(p.sim) AS ms
       |  FROM rem$t c JOIN p ON p.query_id = c.query_id
       |    AND p.da = c.vec_id
       |  JOIN sel${t - 1} s ON s.query_id = p.query_id
       |    AND s.vec_id = p.db
       |  GROUP BY 1, 2, 3),
       |pick$t AS (SELECT query_id, $t AS rank, vec_id, rel,
       |    $lam * rel - ${1000 - lam} * ms AS score
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY $lam * rel - ${1000 - lam} * ms DESC, vec_id)
       |      AS rn FROM ms$t) WHERE rn = 1),
       |sel$t AS (SELECT * FROM sel${t - 1}
       |  UNION ALL SELECT * FROM pick$t)""".stripMargin
  }

  private def mmrOracle: String = {
    val qids = Round3Queries.AnnQueryIds.mkString("(", ", ", ")")
    val steps = (2 to MmrK).map(mmrStep).mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e
       |  WHERE vec_id IN $qids),
       |sc AS (SELECT query_id, vec_id,
       |    round(list_cosine_similarity(qv, v), 4) AS cos_sim
       |  FROM q, e WHERE vec_id <> query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, vec_id) AS rank FROM sc),
       |cand AS (SELECT query_id, vec_id,
       |    CAST(round(cos_sim * 1e6) AS BIGINT) AS rel
       |  FROM rk WHERE rank <= $MmrPool),
       |p AS (SELECT a.query_id, a.vec_id AS da, b.vec_id AS db,
       |    CAST(round(round(list_cosine_similarity(av.v, bv.v), 4)
       |      * 1e6) AS BIGINT) AS sim
       |  FROM cand a JOIN cand b ON a.query_id = b.query_id
       |    AND a.vec_id <> b.vec_id
       |  JOIN e av ON av.vec_id = a.vec_id
       |  JOIN e bv ON bv.vec_id = b.vec_id),
       |sel1 AS (SELECT query_id, 1 AS rank, vec_id, rel,
       |    $MmrLambda * rel AS score
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY $MmrLambda * rel DESC, vec_id) AS rn FROM cand)
       |  WHERE rn = 1),
       |$steps
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
       |  rel AS rel_micro, CAST(score AS BIGINT) AS mmr_score
       |FROM sel$MmrK ORDER BY query_id, rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q268_mmr_rerank" -> mmrOracle,

    "q272_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
        |  p.event_id AS p_event, p.value AS p_value, p.ts AS p_ts
        |FROM events c JOIN events p ON p.user_id = c.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 1 HOUR
        |ORDER BY c.user_id, click_id, p_event""".stripMargin,

    "q269_nelson_aalen" ->
      """WITH u AS (SELECT user_id AS u,
        |    min(date_trunc('day', ts)::DATE) AS entry,
        |    min(CASE WHEN event_type = 'error' AND value > 150
        |      THEN date_trunc('day', ts)::DATE END) AS event_day
        |  FROM events GROUP BY 1),
        |b AS (SELECT max(date_trunc('day', ts)::DATE) AS horizon
        |  FROM events),
        |lt AS (SELECT CAST(CASE WHEN event_day IS NOT NULL
        |      THEN event_day - entry ELSE horizon - entry END AS BIGINT)
        |      AS t,
        |    event_day IS NOT NULL AS observed FROM u, b),
        |cs AS (SELECT t, sum(CASE WHEN observed THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN observed THEN 0 ELSE 1 END) AS c
        |  FROM lt GROUP BY t),
        |w AS (SELECT *, CAST(sum(d + c) OVER () -
        |      coalesce(sum(d + c) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_at_risk FROM cs),
        |k AS (SELECT *, CASE WHEN d > 0
        |    THEN (CAST(d AS BIGINT) * 1000000) // n_at_risk
        |    ELSE 0 END AS cell_micro FROM w)
        |SELECT t, n_at_risk, CAST(d AS BIGINT) AS n_events,
        |  CAST(c AS BIGINT) AS n_censored,
        |  CAST(sum(cell_micro) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS BIGINT) AS hazard_micro
        |FROM k ORDER BY t""".stripMargin,

    "q267_conformal" ->
      """WITH b AS (SELECT event_type AS g, (user_id % 2 = 1) AS cal,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm FROM events),
        |m AS (SELECT g, CAST((CASE WHEN sum(vm) < 0 THEN -1 ELSE 1 END)
        |    * (abs(CAST(sum(vm) AS HUGEINT)) // count(*))
        |    AS BIGINT) AS yhat FROM b WHERE cal GROUP BY g),
        |e AS (SELECT b.cal, abs(b.vm - m.yhat) AS s
        |  FROM b JOIN m ON m.g = b.g),
        |cen AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM e
        |  WHERE cal GROUP BY s),
        |cm AS (SELECT s, CAST(sum(c) OVER (ORDER BY s ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER () AS BIGINT) AS n_cal FROM cen),
        |q AS (SELECT n_cal, min(CASE WHEN cum >=
        |      ((n_cal + 1) * 900 + 999) // 1000 THEN s END)
        |    AS qhat_micro FROM cm GROUP BY n_cal),
        |ev AS (SELECT s FROM e WHERE NOT cal)
        |SELECT q.n_cal, CAST(count(*) AS BIGINT) AS n_eval,
        |  q.qhat_micro,
        |  CASE WHEN q.qhat_micro IS NOT NULL THEN CAST(sum(CASE WHEN
        |    s <= q.qhat_micro THEN 1 ELSE 0 END) AS BIGINT) END
        |    AS n_covered,
        |  CASE WHEN q.qhat_micro IS NOT NULL THEN
        |    CAST((CAST(sum(CASE WHEN s <= q.qhat_micro THEN 1 ELSE 0
        |      END) AS HUGEINT) * 1000000) // count(*) AS BIGINT) END
        |    AS coverage_ppm,
        |  CAST(900000 AS BIGINT) AS target_ppm
        |FROM ev, q GROUP BY q.n_cal, q.qhat_micro""".stripMargin)
}
