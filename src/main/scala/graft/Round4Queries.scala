package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, DedupConfig, RangeJoin}

/** Round-4 queries: the production-capped dedup variants.
  *
  * q61 runs the MinHash near-dup pipeline with [[DedupConfig.Production]]
  * skew caps ON — the configuration a 100 TB run would use. The capped
  * pipeline is deliberately lossy (hot LSH buckets are skipped), so there
  * is no exact SQL oracle; the driver records a rows-only check and
  * DedupSpec asserts the capped output is a subset of the exact q34
  * output with bounded recall loss. Bench-wise the row exists so the
  * capped and uncapped pipelines are both measured every round.
  */
object Round4Queries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_minhash_capped" -> ((s, dir) =>
      Dedup.minhashNearDups(docs(s, dir),
        maxBucketSize = DedupConfig.Production.maxBucketSize)
        .orderBy("doc_a", "doc_b")),

    // As-of join: attribute each click to the user's most recent
    // at-or-before purchase. The right side is pre-aggregated to one row
    // per (user_id, ts) (max_by on event_id) so the carried payload is
    // deterministic — matching what DuckDB's native ASOF JOIN picks.
    "q62_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("p_event"),
          max_by(col("value"), col("event_id")).as("p_value"))
      AsOfJoin.asofLast(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("p_event", "p_value"))
        .orderBy("user_id", "event_id")
    }),

    // Binned range join: clicks landing inside each purchase's 2-hour
    // attribution window, per user — counted per purchase. Bin width =
    // the window width, so each interval registers under ≤2 bins.
    "q63_range_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event"),
          unix_timestamp(col("ts")).as("lo"),
          (unix_timestamp(col("ts")) + WindowSeconds).as("hi"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_timestamp(col("ts")).as("v"))
      RangeJoin.binnedRangeJoin(clicks, purchases, Seq("user_id"),
        "v", "lo", "hi", binWidth = WindowSeconds)
        .groupBy("p_event")
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy("p_event")
    }))

  /** 2 h attribution window for q63 (seconds). */
  val WindowSeconds = 7200L

  val oracleSql: Map[String, String] = Map(
    "q62_asof_join" ->
      """WITH c AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, max(event_id) AS p_event,
        |    arg_max(value, event_id) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.ts, p.p_event, p.p_value
        |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q63_range_join" ->
      s"""WITH p AS (SELECT user_id, event_id AS p_event,
         |    CAST(epoch(ts) AS BIGINT) AS lo,
         |    CAST(epoch(ts) AS BIGINT) + $WindowSeconds AS hi
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, CAST(epoch(ts) AS BIGINT) AS v FROM events
         |  WHERE event_type = 'click')
         |SELECT p_event, count(*) AS n_clicks
         |FROM p JOIN c ON p.user_id = c.user_id AND c.v >= p.lo AND c.v < p.hi
         |GROUP BY p_event ORDER BY p_event""".stripMargin)
}
