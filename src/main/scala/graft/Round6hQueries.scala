package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, SketchRollup}

/** Round-6 part nine: multi-feature information gain (one-scan feature
  * selection), mergeable HLL sketch rollups (rows-only — the q43
  * sketch class), and hierarchy share-of-parent rollup.
  */
object Round6hQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IG of source / lang / length-bucket w.r.t. the is-English label —
    // one scan, F× scan-stage melt, nano-nat entropies. (lang trivially
    // saturates IG = H(Y) — the sanity anchor; the other two rank.)
    "q152_info_gain" -> ((s, dir) =>
      Correlate.informationGain(
        docs(s, dir).withColumn("len_bucket", expr("n_chars div 100")),
        Seq("source", "lang", "len_bucket"), col("lang") === "en")),

    // Weekly distinct users from UNIONED daily HLL sketches, graded
    // in-plan against the exact twin — distinct_exact is oracle-hashable
    // and within_bound is the frozen ~5σ HLL band, so the rollup is
    // fully driver-green (DataSketches itself has no DuckDB mirror; the
    // union-≡-direct law stays spec-pinned in Round6hSpec). The 100 TB
    // production path remains weeklyDistinct over persisted sketches.
    "q153_sketch_rollup" -> ((s, dir) =>
      SketchRollup.weeklyDistinctChecked(Tables.load(s, dir, "events"))),

    // q153a: the exact twin of the sketch rollup — same week buckets
    // and row accounting with count_distinct, so the bucketing and
    // accounting of q153 are oracle-pinned even though its HLL estimate
    // cannot be (DuckDB sketches differently).
    "q153a_weekly_distinct_exact" -> ((s, dir) =>
      SketchRollup.weeklyDistinctExact(Tables.load(s, dir, "events"))),

    // Region → nation revenue rollup with exact share-of-parent /
    // share-of-grand basis points (cents-integer revenue).
    "q154_share_of_parent" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("rev_cents"))
      import org.apache.spark.sql.expressions.Window
      rev
        .withColumn("region_rev_cents",
          sum("rev_cents").over(Window.partitionBy("r_name")))
        .withColumn("grand_rev_cents",
          sum("rev_cents").over(Window.partitionBy()))
        .withColumn("share_of_region_bp",
          expr("(rev_cents * 10000) div region_rev_cents"))
        .withColumn("share_of_grand_bp",
          expr("(region_rev_cents * 10000) div grand_rev_cents"))
        .orderBy("r_name", "n_name")
    }))

  val oracleSql: Map[String, String] = Map(
    // q153a's exact relation + within_bound TRUE: the Spark side goes
    // hash-red the day the HLL estimate leaves its frozen 8%+10 band.
    "q153_sketch_rollup" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_exact,
        |  TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY week_start""".stripMargin,

    "q153a_weekly_distinct_exact" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_exact
        |FROM events GROUP BY 1 ORDER BY week_start""".stripMargin,
    "q152_info_gain" ->
      """WITH m AS (
        |  SELECT 'source' AS feature, source AS x, lang = 'en' AS y
        |    FROM documents
        |  UNION ALL SELECT 'lang', lang, lang = 'en' FROM documents
        |  UNION ALL SELECT 'len_bucket', CAST(n_chars // 100 AS VARCHAR),
        |    lang = 'en' FROM documents),
        |c AS (SELECT feature, x, y, count(*) AS n_xy FROM m GROUP BY 1, 2, 3),
        |cc AS (SELECT *, sum(n_xy) OVER (PARTITION BY feature, x) AS n_x,
        |    sum(n_xy) OVER (PARTITION BY feature) AS n FROM c),
        |cond AS (SELECT feature, CAST(count(DISTINCT x) AS BIGINT)
        |      AS n_levels, CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(CAST(round((n_xy::DOUBLE / n) *
        |      ln(n_x::DOUBLE / n_xy) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS h_cond_nano
        |  FROM cc GROUP BY feature),
        |lc AS (SELECT feature, y, sum(n_xy) AS n_y FROM c GROUP BY 1, 2),
        |lcc AS (SELECT *, sum(n_y) OVER (PARTITION BY feature) AS n FROM lc),
        |hl AS (SELECT feature,
        |    CAST(sum(CAST(round((n_y::DOUBLE / n) *
        |      ln(n::DOUBLE / n_y) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS h_label_nano
        |  FROM lcc GROUP BY feature)
        |SELECT cond.feature, cond.n_levels, cond.n, hl.h_label_nano,
        |  cond.h_cond_nano,
        |  CAST(hl.h_label_nano - cond.h_cond_nano AS BIGINT) AS ig_nano
        |FROM cond JOIN hl USING (feature) ORDER BY feature""".stripMargin,

    "q154_share_of_parent" ->
      """WITH rev AS (SELECT r_name, n_name,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(sum(rev_cents) OVER (PARTITION BY r_name) AS BIGINT)
        |      AS region_rev_cents,
        |    CAST(sum(rev_cents) OVER () AS BIGINT) AS grand_rev_cents
        |  FROM rev)
        |SELECT r_name, n_name, rev_cents, region_rev_cents,
        |  grand_rev_cents,
        |  CAST((rev_cents * 10000) // region_rev_cents AS BIGINT)
        |    AS share_of_region_bp,
        |  CAST((region_rev_cents * 10000) // grand_rev_cents AS BIGINT)
        |    AS share_of_grand_bp
        |FROM w ORDER BY r_name, n_name""".stripMargin)
}
