package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Deciles, Sampling, Split, TextOps}

/** Round-5 queries: the scale-safe decile axis (q58a), the remaining
  * as-of-join quadrants oracled against DuckDB's native ASOF variants
  * (q62a strict, q62b left), and the leakage-safe split (q64a) oracled
  * via the recursive-CTE connected components composed with the split
  * hash CASE.
  *
  * Oracle conventions as in [[LlmQueries]]: identical aliases, identical
  * rounding, deterministic total ORDER BY on both sides. q58a is the one
  * rows-only entry here — its boundaries come from `approx_percentile`
  * (a Greenwald-Khanna sketch, engine-specific by construction, same
  * justification as q43); Round5Spec pins its populations against the
  * exact deciles instead.
  */
object Round5Queries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scale-safe token-length deciles: approx_percentile boundaries (one
    // agg) + scan-stage classification — no data-path window, no serial
    // per-source sort. The 100 TB twin of q58.
    "q58a_token_deciles_approx" -> ((s, dir) =>
      Deciles.report(
        docs(s, dir)
          .select(col("source"), col("doc_id"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "n_tokens", "doc_id", exact = false)),

    // As-of join, strictly-before quadrant: each click attributed to the
    // most recent purchase with ts < click ts (ASOF `>`): a purchase at
    // the exact click instant no longer matches.
    "q62a_asof_strict" -> ((s, dir) => {
      val (clicks, purchases) = asofSides(s, dir)
      AsOfJoin.asofLast(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("p_event", "p_value"), inclusive = false)
        .orderBy("user_id", "event_id")
    }),

    // As-of join, LEFT quadrant: clicks with no preceding purchase are
    // kept with null payload.
    "q62b_asof_left" -> ((s, dir) => {
      val (clicks, purchases) = asofSides(s, dir)
      AsOfJoin.asofLast(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("p_event", "p_value"), joinType = "left")
        .orderBy("user_id", "event_id")
    }),

    // Leakage-safe split: every near-dup CLUSTER (connected component of
    // the verified MinHash pairs) lands in one split; per (split, source)
    // doc counts, same rollup as q64.
    "q64a_split_leakage_safe" -> ((s, dir) => {
      val d = docs(s, dir)
      Split.assignSplitsLeakageSafe(d, Dedup.minhashNearDups(d),
        Round4Queries.SplitWeights)
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "source")
    }))

  /** q62*'s shared sides: clicks probe, purchases pre-aggregated to one
    * row per (user_id, ts) so the carried payload is deterministic.
    */
  private def asofSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("p_event"),
        max_by(col("value"), col("event_id")).as("p_value"))
    (clicks, purchases)
  }

  private val asofCtes =
    """c AS (SELECT user_id, event_id, ts FROM events
      |  WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, max(event_id) AS p_event,
      |    arg_max(value, event_id) AS p_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)""".stripMargin

  /** The q64 split CASE over an arbitrary key expression — same Knuth
    * hash and thresholds as [[Split.splitExpr]]/[[Sampling.idHash]].
    */
  private def splitCaseSql(keyExpr: String): String = {
    val m = Sampling.HashMod
    val h = s"(($keyExpr % $m) * 2654435761) % $m"
    val conds = Round4Queries.SplitWeights
      .zip(Split.thresholds(Round4Queries.SplitWeights))
    val cases = conds.init
      .map { case ((name, _), thr) => s"WHEN $h < $thr THEN '$name'" }
      .mkString(" ")
    s"CASE $cases ELSE '${conds.last._1._1}' END"
  }

  val oracleSql: Map[String, String] = Map(
    "q62a_asof_strict" ->
      s"""WITH $asofCtes
         |SELECT c.user_id, c.event_id, c.ts, p.p_event, p.p_value
         |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts > p.ts
         |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q62b_asof_left" ->
      s"""WITH $asofCtes
         |SELECT c.user_id, c.event_id, c.ts, p.p_event, p.p_value
         |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
         |ORDER BY c.user_id, c.event_id""".stripMargin,

    // CC over the verified MinHash pairs (q50's recursive CTE), then the
    // q64 hash CASE keyed by coalesce(cluster, doc_id).
    "q64a_split_leakage_safe" ->
      s"""WITH RECURSIVE ${LlmQueries.minhashPairsCtes},
         |pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |r AS (SELECT DISTINCT src AS id, src AS lab FROM edges
         |  UNION SELECT e.src, r.lab FROM edges e JOIN r ON e.dst = r.id),
         |cc AS (SELECT id, min(lab) AS cluster FROM r GROUP BY id),
         |d AS (SELECT d.source, coalesce(cc.cluster, d.doc_id) AS k
         |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id),
         |s AS (SELECT source, ${splitCaseSql("k")} AS split FROM d)
         |SELECT split, source, count(*) AS n_docs FROM s
         |GROUP BY split, source ORDER BY split, source""".stripMargin)
}
