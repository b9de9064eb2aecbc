package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Correlate, Evaluation, Graph, Privacy, TimeSeries}

/** Round-6 part three: graph analytics (PageRank, triangles) over the
  * order co-purchase graph, classifier evaluation (AUC, calibration),
  * privacy audit (k-anonymity), categorical mutual information, and
  * per-key OLS trend.
  *
  * Every oracle is driver-exact by construction: integer micro/nano
  * arithmetic cores, value-domain windows only, DuckDB HUGEINT sums
  * cast to BIGINT at the output boundary (the q83/q98/q99 lesson).
  */
object Round6bQueries {

  /** q129/q130's graph: parts co-purchased within an order. The
    * stop-group cap (10 items) BINDS at sf0.01 — 96 of 14,743 orders
    * exceed it (the largest fans out 78 pair rows vs the cap's 45) —
    * proving the CAPPED path against the oracle, not just the exact
    * tier (the q61a/q97a rule).
    */
  val CoPurchaseCap = 10L

  /** q129's iteration count: 3 rounds of the damping-0.85 micro-rank
    * update, unrolled mechanically in the oracle (the q123 pattern).
    */
  val PrIterations = 3

  /** q131's anonymity threshold: at sf0.01 the (event_type, day, hour)
    * partition has 3,385 classes, 624 of them single-user — both flags
    * bind richly at k = 3.
    */
  val AnonK = 3L

  val CalBins = 10

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  private[graft] def coPurchase(s: SparkSession, dir: String): DataFrame =
    Graph.coOccurrenceEdges(Tables.load(s, dir, "lineitem"),
      "l_orderkey", "l_partkey", maxGroupSize = Some(CoPurchaseCap))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank over the co-purchase part graph: 3 micro-integer damping
    // rounds, one join + one keyed sum per round, ranks localCheckpoint'd
    // (never collected). Hub parts surface as high-centrality nodes.
    "q129_pagerank" -> ((s, dir) =>
      Graph.pageRankMicro(coPurchase(s, dir), PrIterations)),

    // Per-node triangle census + clustering coefficient, degree-ordered
    // orientation (out-degree ≤ O(√m) — hub-safe wedge join).
    "q130_triangles" -> ((s, dir) =>
      Graph.triangleReport(coPurchase(s, dir))),

    // k-anonymity audit of the event log under the (event_type, day,
    // hour) quasi-identifier: class sizes, distinct-user diversity, and
    // both violation flags. One scan, one aggregate.
    "q131_k_anonymity" -> ((s, dir) =>
      Privacy.kAnonymityReport(
        events(s, dir)
          .withColumn("day", to_date(col("ts")))
          .withColumn("hour", hour(col("ts")).cast("int")),
        Seq("event_type", "day", "hour"), "user_id", AnonK)),

    // ROC AUC of n_chars as an English-detector score, per source:
    // rank-sum identity over the distinct-score histogram (value-domain
    // windows only; doubled-integer pair count is the hash core).
    "q132_auc" -> ((s, dir) =>
      Evaluation.aucReport(docs(s, dir), "source", "n_chars",
        col("lang") === "en")),

    // Calibration bins for the same score/label: frozen integer bin
    // arithmetic off one broadcast min/max row, all-integer output.
    "q133_calibration" -> ((s, dir) =>
      Evaluation.calibrationReport(docs(s, dir), "n_chars",
        col("lang") === "en", CalBins)),

    // Mutual information between source and language over documents:
    // contingency census + nano-nat cell contributions (the q87
    // convention), marginals as windows over the 100 stat rows.
    "q134_mutual_information" -> ((s, dir) =>
      Correlate.mutualInformation(docs(s, dir), "source", "lang")),

    // Per-event-type OLS trend of daily value volume: daily micro sums,
    // closed-form regression from DECIMAL(38,0) sufficient statistics,
    // integer num/den as the hash core.
    "q135_trend" -> ((s, dir) =>
      TimeSeries.trendReport(events(s, dir), "event_type")))

  /** Shared SQL for the capped co-purchase edge relation (doc oracle of
    * [[Graph.coOccurrenceEdges]]): distinct (order, part), stop-group
    * cap, distinct a<b pairs.
    */
  private[graft] val edgesSql: String =
    s"""li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it FROM lineitem),
       |hot AS (SELECT g FROM li GROUP BY g HAVING count(*) > $CoPurchaseCap),
       |lic AS (SELECT * FROM li WHERE g NOT IN (SELECT g FROM hot)),
       |e0 AS (SELECT a.it AS na, b.it AS nb FROM lic a
       |  JOIN lic b ON a.g = b.g AND a.it < b.it GROUP BY 1, 2),
       |ed AS (SELECT na AS src, nb AS dst FROM e0
       |  UNION ALL SELECT nb, na FROM e0),
       |dg AS (SELECT src AS node, count(*) AS deg FROM ed GROUP BY src)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // 3 unrolled micro-rank rounds; every step BIGINT floor division on
    // non-negative values, so // ≡ Spark's div.
    "q129_pagerank" -> {
      def step(prev: String, out: String) =
        s"""$out AS (SELECT d.node,
           |    150000 + (85 * coalesce(s.m, 0)) // 100 AS r
           |  FROM dg d LEFT JOIN (
           |    SELECT e.dst AS node, sum(p.r // x.deg) AS m
           |    FROM ed e JOIN $prev p ON p.node = e.src
           |    JOIN dg x ON x.node = e.src
           |    GROUP BY e.dst) s ON s.node = d.node)""".stripMargin
      s"""WITH $edgesSql,
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM dg),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT d.node, d.deg AS degree, CAST(r3.r AS BIGINT) AS rank_micro
         |FROM dg d JOIN r3 ON r3.node = d.node ORDER BY d.node""".stripMargin
    },

    // Degree-ordered orientation; each triangle counted once at a<b<c in
    // orientation order, fanned back to its three corners.
    "q130_triangles" ->
      s"""WITH $edgesSql,
         |o AS (SELECT CASE WHEN (x.deg, e0.na) < (y.deg, e0.nb)
         |      THEN e0.na ELSE e0.nb END AS src,
         |    CASE WHEN (x.deg, e0.na) < (y.deg, e0.nb)
         |      THEN e0.nb ELSE e0.na END AS dst
         |  FROM e0 JOIN dg x ON x.node = e0.na JOIN dg y ON y.node = e0.nb),
         |tri AS (SELECT a.src AS ta, a.dst AS tb, b.dst AS tc
         |  FROM o a JOIN o b ON a.dst = b.src
         |  JOIN o c ON c.src = a.src AND c.dst = b.dst),
         |pn AS (SELECT node, count(*) AS t FROM (
         |    SELECT ta AS node FROM tri UNION ALL SELECT tb FROM tri
         |    UNION ALL SELECT tc FROM tri) GROUP BY node)
         |SELECT d.node, d.deg AS degree,
         |  CAST(coalesce(pn.t, 0) AS BIGINT) AS n_triangles,
         |  CASE WHEN d.deg >= 2 THEN
         |    round(2.0 * coalesce(pn.t, 0) / (d.deg::DOUBLE * (d.deg - 1)), 6)
         |  END AS clustering
         |FROM dg d LEFT JOIN pn ON pn.node = d.node
         |ORDER BY d.node""".stripMargin,

    "q131_k_anonymity" ->
      s"""SELECT event_type, date_trunc('day', ts)::DATE AS day,
         |  CAST(extract(hour FROM ts) AS INTEGER) AS hour,
         |  count(*) AS n_rows, count(DISTINCT user_id) AS n_ids,
         |  count(*) < $AnonK AS k_violation,
         |  count(DISTINCT user_id) = 1 AS single_id
         |FROM events GROUP BY 1, 2, 3
         |ORDER BY event_type, day, hour""".stripMargin,

    // Rank-sum AUC over the distinct-score histogram: cumneg via a
    // ROWS-framed window over score order, doubled-integer pair count.
    "q132_auc" ->
      """WITH h AS (SELECT source AS g, n_chars AS s,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
        |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
        |  FROM documents GROUP BY 1, 2),
        |c AS (SELECT *, coalesce(sum(neg) OVER (PARTITION BY g ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
        |  FROM h),
        |a AS (SELECT g, CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg,
        |    CAST(sum(pos * (2 * cumneg + neg)) AS BIGINT) AS auc_num2
        |  FROM c GROUP BY g)
        |SELECT g AS source, n_pos, n_neg, auc_num2,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    round(auc_num2::DOUBLE / (2.0 * n_pos * n_neg), 6)
        |  END AS auc
        |FROM a ORDER BY source""".stripMargin,

    // Frozen-bounds integer bins; all-integer floor means and ppm rates.
    "q133_calibration" ->
      s"""WITH v AS (SELECT CAST(n_chars AS BIGINT) AS s,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |b AS (SELECT min(s) AS mn, max(s) AS mx FROM v)
         |SELECT ((s - mn) * $CalBins) // (mx - mn + 1) AS bin,
         |  count(*) AS n_rows, CAST(sum(y) AS BIGINT) AS n_pos,
         |  CAST(sum(s) // count(*) AS BIGINT) AS mean_score_floor,
         |  CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS pos_rate_ppm
         |FROM v, b GROUP BY 1 ORDER BY bin""".stripMargin,

    // Contingency census + nano-nat cells; same double association as
    // the Spark side ((n_ab/n) · ln(n·n_ab/(n_a·n_b)) · 1e9).
    "q134_mutual_information" ->
      """WITH c AS (SELECT source AS a, lang AS b, count(*) AS n_ab
        |  FROM documents GROUP BY 1, 2),
        |w AS (SELECT *, sum(n_ab) OVER (PARTITION BY a) AS n_a,
        |    sum(n_ab) OVER (PARTITION BY b) AS n_b,
        |    sum(n_ab) OVER () AS n FROM c),
        |k AS (SELECT a, b, n_ab,
        |    CAST(round((n_ab::DOUBLE / n) *
        |      ln(n::DOUBLE * n_ab / (n_a::DOUBLE * n_b)) * 1e9) AS BIGINT)
        |      AS contrib_nano
        |  FROM w)
        |SELECT a AS source, b AS lang, n_ab, contrib_nano,
        |  CAST(sum(contrib_nano) OVER () AS BIGINT) AS mi_nano
        |FROM k ORDER BY source, lang""".stripMargin,

    // Daily micro sums → closed-form OLS from HUGEINT sufficient
    // statistics (exact, the pearsonMatrix convention), num/den BIGINT.
    "q135_trend" ->
      """WITH d0 AS (SELECT event_type AS key, date_trunc('day', ts)::DATE
        |    AS day, CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
        |    AS y
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS day0 FROM d0),
        |d AS (SELECT key, CAST(day - day0 AS BIGINT) AS x, y FROM d0, b),
        |s AS (SELECT key, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy FROM d GROUP BY key),
        |f AS (SELECT key, n, CAST(n * sxy - sx * sy AS BIGINT) AS num,
        |    CAST(n * sxx - sx * sx AS BIGINT) AS den FROM s)
        |SELECT key AS event_type, CAST(n AS BIGINT) AS n_days,
        |  num AS slope_num, den AS slope_den,
        |  CASE WHEN den > 0 THEN round(num::DOUBLE / den::DOUBLE, 6) END
        |    AS slope_micro_per_day
        |FROM f ORDER BY event_type""".stripMargin)
}
