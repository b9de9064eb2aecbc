package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Deciles, Evaluation, Experiment, Relevance}

/** Round-8 part ten: isotonic score calibration, DSIR importance
  * weights for data selection, and the Cochran–Armitage trend test.
  */
object Round8jQueries {

  val IsoBins = 20
  val DsirTopK = 40
  val CaBins = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The monotone calibration map of "value score -> purchase rate":
    // the weighted-L2 isotonic fit over the reliability bins.
    "q248_isotonic_calibration" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("s", round(col("value") * 1e6).cast("long"))
      Evaluation.isotonicCalibration(ev, "s",
        col("event_type") === "purchase", IsoBins)
    }),

    // Which documents "look most like" the English slice — unigram
    // DSIR importance ranking for curation resampling.
    "q249_dsir_importance" -> ((s, dir) =>
      Relevance.importanceWeights(Tables.load(s, dir, "documents"),
        col("lang") === "en", DsirTopK)),

    // Does the English rate trend across document-length deciles —
    // the ordered dose-response read. Decile assignment rides the
    // distributed exact-ntile (census offsets + per-value partitioned
    // rank), bit-identical to the oracle's global ntile without an
    // unpartitioned window over the raw documents relation.
    "q250_cochran_armitage" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val d = Deciles.ntileExact(docs, "n_chars", "doc_id", CaBins, "t")
      Experiment.cochranArmitage(d, "t", col("lang") === "en")
    }))

  val oracleSql: Map[String, String] = Map(
    "q248_isotonic_calibration" ->
      s"""WITH v AS (SELECT CAST(round(value * 1e6) AS BIGINT) AS s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |b AS (SELECT min(s) AS mn, max(s) AS mx FROM v),
         |c AS (SELECT ((s - mn) * $IsoBins) // (mx - mn + 1) AS bin,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(y) AS BIGINT) AS n_pos
         |  FROM v, b GROUP BY 1),
         |p AS (SELECT bin, n_rows, n_pos,
         |    sum(n_rows) OVER w AS cum_n, sum(n_pos) OVER w AS cum_p
         |  FROM c WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |    PRECEDING AND CURRENT ROW)),
         |pr AS (SELECT lo.bin AS j, hi.bin AS k,
         |    ((hi.cum_p - (lo.cum_p - lo.n_pos)) * 1000000) //
         |      (hi.cum_n - (lo.cum_n - lo.n_rows)) AS avg_ppm
         |  FROM p lo JOIN p hi ON lo.bin <= hi.bin),
         |sm AS (SELECT j, k, min(avg_ppm) OVER (PARTITION BY j
         |    ORDER BY k DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    CURRENT ROW) AS sm FROM pr),
         |i AS (SELECT k AS bin, CAST(max(sm) AS BIGINT)
         |    AS iso_rate_ppm FROM sm GROUP BY 1)
         |SELECT c.bin, c.n_rows, c.n_pos,
         |  (c.n_pos * 1000000) // c.n_rows AS pos_rate_ppm,
         |  i.iso_rate_ppm
         |FROM c JOIN i USING (bin) ORDER BY bin""".stripMargin,

    "q249_dsir_importance" ->
      s"""WITH tf AS (SELECT doc_id AS id, lang = 'en' AS tgt, w,
         |    CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, lang, unnest(${LlmQueries.tokSql})
         |      AS w FROM documents)
         |  GROUP BY 1, 2, 3),
         |wc AS (SELECT w, CAST(sum(tf) AS BIGINT) AS cs,
         |    CAST(sum(CASE WHEN tgt THEN tf ELSE 0 END) AS BIGINT)
         |      AS ct
         |  FROM tf GROUP BY 1),
         |t AS (SELECT CAST(sum(cs) AS BIGINT) AS n_src,
         |    CAST(sum(ct) AS BIGINT) AS n_tgt,
         |    CAST(count(*) AS BIGINT) AS vocab FROM wc),
         |lam AS (SELECT w,
         |    CAST(round(ln((ct + 1)::DOUBLE) * 1e9) AS BIGINT) -
         |    CAST(round(ln((n_tgt + vocab)::DOUBLE) * 1e9) AS BIGINT) -
         |    CAST(round(ln((cs + 1)::DOUBLE) * 1e9) AS BIGINT) +
         |    CAST(round(ln((n_src + vocab)::DOUBLE) * 1e9) AS BIGINT)
         |      AS lam_nano
         |  FROM wc, t),
         |sc AS (SELECT id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |    CAST(sum(CAST(tf AS HUGEINT) * lam_nano) AS BIGINT)
         |      AS logw_nano
         |  FROM tf JOIN lam USING (w) GROUP BY 1)
         |SELECT id AS doc_id, n_tokens, logw_nano,
         |  CAST(row_number() OVER (ORDER BY logw_nano DESC, id)
         |    AS BIGINT) AS rank
         |FROM sc ORDER BY rank LIMIT $DsirTopK""".stripMargin,

    "q250_cochran_armitage" ->
      s"""WITH d AS (SELECT CAST(ntile($CaBins) OVER (ORDER BY
         |      n_chars, doc_id) AS BIGINT) AS t,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents),
         |c AS (SELECT t, CAST(count(*) AS BIGINT) AS n_g,
         |    CAST(sum(y) AS BIGINT) AS r_g FROM d GROUP BY 1),
         |a AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
         |    CAST(sum(r_g) AS BIGINT) AS n_pos,
         |    CAST(count(*) AS BIGINT) AS n_groups,
         |    CAST(sum(CAST(t AS HUGEINT) * n_g) AS HUGEINT) AS stn,
         |    CAST(sum(CAST(t AS HUGEINT) * r_g) AS HUGEINT) AS str,
         |    CAST(sum(CAST(t AS HUGEINT) * t * n_g) AS HUGEINT)
         |      AS sttn
         |  FROM c)
         |SELECT n, n_pos, n_groups,
         |  CASE WHEN CAST(n_pos AS HUGEINT) * (n - n_pos) *
         |      (CAST(n AS HUGEINT) * sttn - stn * stn) > 0 THEN
         |    round((CAST(n AS HUGEINT) * str -
         |        CAST(n_pos AS HUGEINT) * stn)::DOUBLE /
         |      sqrt((CAST(n_pos AS HUGEINT) * (n - n_pos) *
         |        (CAST(n AS HUGEINT) * sttn - stn * stn))::DOUBLE /
         |        n::DOUBLE), 6)
         |  END AS z_trend
         |FROM a""".stripMargin)
}
