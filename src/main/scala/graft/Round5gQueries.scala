package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Batching, Correlate, EventFunnel, ProductQuantization, Reshape, TimeSeries}

/** Round-5 additions, part seven — the remaining report/analysis shapes a
  * complete engine owes its users: IVF-PQ ANN (q102, the FAISS-standard
  * coarse-cells + residual-codes composition of q42 and q60), wide pivot
  * reports (q103), cohort retention (q104), ordered event-sequence
  * funnels (q105), sequence-length batch-padding accounting (q106), an
  * exact-integer Pearson correlation matrix (q107), and CUBE grouping
  * (q108, the grouping-sets completion of q15's ROLLUP).
  *
  * Oracle conventions as in [[LlmQueries]]: integer quantization before
  * any order-dependent Σ (micro-points for values, micro-units for
  * distances, HUGEINT/DECIMAL(38,0) for correlation moments),
  * round-before-compare for derived doubles, DATE columns cast to ISO
  * strings, and pinned centroid/codebook ids so the ANN pipeline replays
  * bit-identically in SQL.
  */
object Round5gQueries {

  /** q102 pinned coarse centroids (the q42 convention) — the PQ codebook
    * ids are [[Round3Queries.PqCodebookIds]].
    */
  val IvfCentroidIds: Seq[Long] = (0 until 16).map(_.toLong * 7)

  /** q103 pivot categories: pinned list = stable schema + single-scan. */
  val PivotCategories = Seq("view", "click", "purchase", "signup", "error")

  /** q105 funnel steps, in required temporal order. */
  val FunnelSteps = Seq("view", "click", "purchase")

  /** q107 correlated columns (lineitem numerics). */
  val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IVF coarse cells + PQ residual codes, single-probe ADC top-k.
    "q102_ann_ivfpq" -> ((s, dir) =>
      ProductQuantization.ivfAdcTopK(Tables.load(s, dir, "embeddings"),
        Round3Queries.AnnQueryIds, Round3Queries.AnnK, IvfCentroidIds,
        Round3Queries.PqCodebookIds)
        .orderBy("query_id", "rank")),

    // Daily × event-type pivot: counts + value sums per category column.
    "q103_pivot_daily" -> ((s, dir) =>
      Reshape.pivotDaily(Tables.load(s, dir, "events"), PivotCategories)),

    // Weekly cohort retention from first-activity day.
    "q104_cohort_retention" -> ((s, dir) =>
      TimeSeries.cohortRetention(Tables.load(s, dir, "events"))),

    // view → click → purchase ordered funnel.
    "q105_sequence_funnel" -> ((s, dir) =>
      EventFunnel.sequenceFunnel(Tables.load(s, dir, "events"),
        FunnelSteps)),

    // Power-of-two length buckets + padding-waste accounting.
    "q106_padding_report" -> ((s, dir) =>
      Batching.paddingReport(Tables.load(s, dir, "documents"))),

    // Exact-integer Pearson matrix over lineitem numerics.
    "q107_correlation" -> ((s, dir) =>
      Correlate.pearsonMatrix(Tables.load(s, dir, "lineitem"), CorrCols)),

    // CUBE over (returnflag, linestatus) — all four grouping sets.
    "q108_cube" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("cnt"), col("sum_qty"))
        .orderBy("flag", "status")))

  private def pivotOracle: String = {
    val cats = PivotCategories.map { c =>
      s"""  CAST(sum(CASE WHEN event_type = '$c' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS ${c}_n,
         |  round(sum(CASE WHEN event_type = '$c'
         |      THEN CAST(round(value * 1000000.0) AS BIGINT)
         |      ELSE 0 END) / 1000000.0, 4) AS ${c}_value""".stripMargin
    }.mkString(",\n")
    s"""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       |$cats
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin
  }

  private def funnelOracle: String = {
    val stepCtes = FunnelSteps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id AS u, min(ts) AS t FROM events
           |  WHERE event_type = '$st' GROUP BY 1)""".stripMargin
      else
        s"""s${i + 1} AS (SELECT e.user_id AS u, min(e.ts) AS t
           |  FROM events e JOIN s$i ON s$i.u = e.user_id AND e.ts > s$i.t
           |  WHERE e.event_type = '$st' GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val unions = FunnelSteps.zipWithIndex.map { case (st, i) =>
      if (i == 0) s"SELECT 1 AS step_idx, '$st' AS step, count(*) AS users FROM s1"
      else s"SELECT ${i + 1}, '$st', count(*) FROM s${i + 1}"
    }.mkString("\n  UNION ALL ")
    s"""WITH $stepCtes,
       |n AS ($unions)
       |SELECT step_idx, step, CAST(users AS BIGINT) AS users,
       |  CASE WHEN (SELECT users FROM n WHERE step_idx = 1) > 0
       |    THEN round(users * 10000.0 /
       |      (SELECT users FROM n WHERE step_idx = 1), 4) END AS conv_bp
       |FROM n ORDER BY step_idx""".stripMargin
  }

  private def corrOracle: String = {
    def m(c: String) = s"m_$c"
    def h(e: String) = s"CAST($e AS HUGEINT)"
    val quant = CorrCols.map(c =>
      s"CAST(round($c * 1000000.0) AS BIGINT) AS ${m(c)}").mkString(",\n    ")
    val pairs = for {
      i <- CorrCols.indices; j <- CorrCols.indices if i < j
    } yield (CorrCols(i), CorrCols(j))
    val moments = (CorrCols.flatMap(c => Seq(
      s"sum(${h(m(c))}) AS s_$c",
      s"sum(${h(m(c))} * ${h(m(c))}) AS ss_$c")) ++
      pairs.map { case (a, b) =>
        s"sum(${h(m(a))} * ${h(m(b))}) AS sp_${a}_${b}"
      }).mkString(",\n    ")
    val rows = pairs.map { case (a, b) =>
      val num = s"CAST(n * sp_${a}_${b} - s_$a * s_$b AS DOUBLE)"
      val dx = s"CAST(n * ss_$a - s_$a * s_$a AS DOUBLE)"
      val dy = s"CAST(n * ss_$b - s_$b * s_$b AS DOUBLE)"
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n,
         |    CASE WHEN $dx > 0 AND $dy > 0
         |      THEN round($num / sqrt($dx * $dy), 6) END AS r FROM s""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH q AS (SELECT
       |    $quant
       |  FROM lineitem),
       |s AS (SELECT count(*) AS n,
       |    $moments
       |  FROM q)
       |$rows
       |ORDER BY col_x, col_y""".stripMargin
  }

  private def ivfpqOracle: String = {
    val cids = IvfCentroidIds.mkString("(", ", ", ")")
    val qids = Round3Queries.AnnQueryIds.mkString("(", ", ", ")")
    val cbValues = Round3Queries.PqCodebookIds.zipWithIndex
      .map { case (v, i) => s"($v, $i)" }.mkString(", ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cc AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id IN $cids),
       |sc AS (SELECT e.vec_id,
       |    round(list_cosine_similarity(e.v, c.cv), 4) AS ccos, c.cid
       |  FROM e, cc c),
       |asg AS (SELECT vec_id, cid AS cell FROM (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS rn FROM sc) WHERE rn = 1),
       |res AS (SELECT e.vec_id, asg.cell,
       |    list_transform(list_zip(e.v, c.cv), x -> x[1] - x[2]) AS r
       |  FROM e JOIN asg ON e.vec_id = asg.vec_id
       |  JOIN cc c ON c.cid = asg.cell),
       |ms AS (SELECT unnest(range(0, 8)) AS m),
       |sn AS (SELECT vec_id, cell, m, r[m*8+1 : m*8+8] AS sv,
       |    list_dot_product(r[m*8+1 : m*8+8], r[m*8+1 : m*8+8]) AS n2
       |  FROM res, ms),
       |pq0 AS (SELECT * FROM (VALUES $cbValues) AS t(cvid, cid)),
       |pcb AS (SELECT pq0.cid, sn.m, sn.sv AS cv, sn.n2 AS cn2
       |  FROM pq0 JOIN sn ON sn.vec_id = pq0.cvid),
       |d AS (SELECT s.vec_id, s.cell, s.m, c.cid,
       |    CAST(round((s.n2 + c.cn2 - 2*list_dot_product(s.sv, c.cv)) * 1e6)
       |      AS BIGINT) AS d2i
       |  FROM sn s JOIN pcb c ON s.m = c.m),
       |enc AS (SELECT vec_id, cell, m, cid AS code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |      ORDER BY d2i, cid) AS rn FROM d) WHERE rn = 1),
       |adist AS (SELECT dq.vec_id AS query_id, ex.vec_id, sum(dq.d2i) AS ai
       |  FROM d dq JOIN enc ex ON dq.m = ex.m AND dq.cid = ex.code
       |    AND dq.cell = ex.cell
       |  WHERE dq.vec_id IN $qids AND ex.vec_id <> dq.vec_id
       |  GROUP BY 1, 2),
       |r AS (SELECT query_id, vec_id, round(ai / 1e6, 4) AS approx_d2,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY ai ASC, vec_id ASC) AS INTEGER) AS rank
       |  FROM adist)
       |SELECT query_id, vec_id, approx_d2, rank FROM r
       |WHERE rank <= ${Round3Queries.AnnK}
       |ORDER BY query_id, rank""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q102_ann_ivfpq" -> ivfpqOracle,

    "q103_pivot_daily" -> pivotOracle,

    "q104_cohort_retention" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
        |  FROM events),
        |c AS (SELECT u, min(day) AS cohort_day FROM du GROUP BY u),
        |sz AS (SELECT cohort_day, count(*) AS cohort_users
        |  FROM c GROUP BY 1),
        |cells AS (SELECT DISTINCT c.cohort_day,
        |    CAST(floor((du.day - c.cohort_day) / 7.0) AS INTEGER) AS period,
        |    du.u
        |  FROM du JOIN c USING (u)),
        |a AS (SELECT cohort_day, period, count(*) AS active_users
        |  FROM cells GROUP BY 1, 2)
        |SELECT CAST(a.cohort_day AS VARCHAR) AS cohort_day, a.period,
        |  CAST(a.active_users AS BIGINT) AS active_users,
        |  CAST(sz.cohort_users AS BIGINT) AS cohort_users,
        |  round(a.active_users * 10000.0 / sz.cohort_users, 4)
        |    AS retention_bp
        |FROM a JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, period""".stripMargin,

    "q105_sequence_funnel" -> funnelOracle,

    "q106_padding_report" ->
      """WITH t AS (SELECT source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (SELECT source, n_tokens,
        |    CASE WHEN n_tokens <= 1 THEN 1
        |      ELSE (1::BIGINT << length(bin(n_tokens - 1))) END AS bucket
        |  FROM t),
        |g AS (SELECT source, bucket, count(*) AS n_docs,
        |    sum(n_tokens) AS sum_tokens
        |  FROM b GROUP BY 1, 2)
        |SELECT source, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(sum_tokens AS BIGINT) AS sum_tokens,
        |  CAST(n_docs * bucket AS BIGINT) AS padded_tokens,
        |  round((n_docs * bucket - sum_tokens) * 10000.0 /
        |    (n_docs * bucket), 4) AS waste_bp
        |FROM g ORDER BY source, bucket""".stripMargin,

    "q107_correlation" -> corrOracle,

    "q108_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin)
}
