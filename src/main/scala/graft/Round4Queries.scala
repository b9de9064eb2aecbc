package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, DedupConfig, Pack, RangeJoin,
  Sampling, Split, TextOps}

/** Round-4 queries: the production-capped dedup variants.
  *
  * q61 runs the MinHash near-dup pipeline with [[DedupConfig.Production]]
  * skew caps ON — the configuration a 100 TB run would use. The cap is
  * lossy but fully DETERMINISTIC (skip band buckets holding > cap docs),
  * so it oracles exactly: [[LlmQueries.minhashPairsCtesCapped]] rebuilds
  * the same bucket-size filter in SQL. At sf0.01 the production cap (64)
  * does not bind, so q61a runs the same pipeline with a cap of 2 — which
  * DOES drop buckets at the gate SF — proving the capped candidate set,
  * not just the uncapped one, matches the oracle.
  */
object Round4Queries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** q61a's deliberately tight bucket cap — binds at sf0.01. */
  val TightBucketCap = 2L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_minhash_capped" -> ((s, dir) =>
      Dedup.minhashNearDups(docs(s, dir),
        maxBucketSize = DedupConfig.Production.maxBucketSize)
        .orderBy("doc_a", "doc_b")),

    "q61a_minhash_cap_bind" -> ((s, dir) =>
      Dedup.minhashNearDups(docs(s, dir),
        maxBucketSize = Some(TightBucketCap))
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
    }),

    // Deterministic 80/10/10 split: per (split, source) doc counts. The
    // assignment is a scan-stage hash CASE — no shuffle until the rollup.
    "q64_split" -> ((s, dir) =>
      Split.assignSplits(docs(s, dir), SplitWeights)
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "source")),

    // Token-budget shard packing: per (source, shard) doc/token totals.
    "q65_pack_shards" -> ((s, dir) =>
      Pack.assignShards(
        docs(s, dir).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        ShardBudgetTokens, "source")
        .groupBy("source", "shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("shard_tokens"))
        .orderBy("source", "shard")))

  /** 2 h attribution window for q63 (seconds). */
  val WindowSeconds = 7200L

  /** q64's split mix. */
  val SplitWeights: Seq[(String, Double)] =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** q65's per-shard token budget — small enough that every source splits
    * into multiple shards at the sf0.01 correctness gate, so the oracle
    * actually exercises shard boundaries (production would use a context
    * window size, e.g. 8192).
    */
  val ShardBudgetTokens = 512L

  val oracleSql: Map[String, String] = Map(
    "q61_minhash_capped" -> {
      val cap = DedupConfig.Production.maxBucketSize.get
      s"""WITH ${LlmQueries.minhashPairsCtesCapped(Some(cap))}
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q61a_minhash_cap_bind" ->
      s"""WITH ${LlmQueries.minhashPairsCtesCapped(Some(TightBucketCap))}
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

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
         |GROUP BY p_event ORDER BY p_event""".stripMargin,

    "q64_split" -> {
      val m = Sampling.HashMod
      val h = s"((doc_id % $m) * 2654435761) % $m"
      val conds = SplitWeights.zip(Split.thresholds(SplitWeights))
      val cases = conds.init
        .map { case ((name, _), thr) => s"WHEN $h < $thr THEN '$name'" }
        .mkString(" ")
      s"""SELECT split, source, count(*) AS n_docs FROM (
         |  SELECT source, CASE $cases ELSE '${conds.last._1._1}' END AS split
         |  FROM documents)
         |GROUP BY split, source ORDER BY split, source""".stripMargin
    },

    "q65_pack_shards" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |s AS (SELECT source, n_tokens,
         |    CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_tokens)
         |      / $ShardBudgetTokens) AS BIGINT) AS shard
         |  FROM t)
         |SELECT source, shard, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |FROM s GROUP BY source, shard ORDER BY source, shard""".stripMargin)
}
