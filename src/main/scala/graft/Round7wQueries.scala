package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.CorpusStats

/** Round-7 part eighteen: Heaps'-law vocabulary-growth exponent. */
object Round7wQueries {

  val HeapsPoints = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q223_heaps_fit" -> ((s, dir) =>
      CorpusStats.heapsFit(Tables.load(s, dir, "documents"),
        HeapsPoints)))

  val oracleSql: Map[String, String] = Map(
    "q223_heaps_fit" ->
      s"""WITH tk AS (SELECT doc_id AS id,
         |    unnest(${LlmQueries.tokSql}) AS w FROM documents),
         |dt AS (SELECT id, CAST(count(*) AS BIGINT) AS nt FROM tk
         |  GROUP BY 1),
         |fdc AS (SELECT w, min(id) AS fd FROM tk GROUP BY 1),
         |bx AS (SELECT max(id) AS mx FROM dt),
         |tp AS (SELECT CAST(u.i AS INTEGER) AS i,
         |    CAST(sum(CASE WHEN id <= ((mx + 1) * u.i) // $HeapsPoints
         |      THEN nt ELSE 0 END) AS BIGINT) AS toks
         |  FROM dt, bx, unnest(range(1, ${HeapsPoints + 1})) u(i)
         |  GROUP BY 1),
         |vp AS (SELECT CAST(u.i AS INTEGER) AS i,
         |    CAST(sum(CASE WHEN fd <= ((mx + 1) * u.i) // $HeapsPoints
         |      THEN 1 ELSE 0 END) AS BIGINT) AS voc
         |  FROM fdc, bx, unnest(range(1, ${HeapsPoints + 1})) u(i)
         |  GROUP BY 1),
         |cells AS (SELECT tp.i, toks, voc,
         |    CAST(round(ln(toks::DOUBLE) * 1e9) AS BIGINT) AS xn,
         |    CAST(round(ln(voc::DOUBLE) * 1e9) AS BIGINT) AS yn,
         |    CAST(round(ln(toks::DOUBLE) * ln(toks::DOUBLE) * 1e9)
         |      AS BIGINT) AS xxn,
         |    CAST(round(ln(toks::DOUBLE) * ln(voc::DOUBLE) * 1e9)
         |      AS BIGINT) AS xyn
         |  FROM tp JOIN vp ON vp.i = tp.i
         |  WHERE toks > 0 AND voc > 0),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
         |    CAST(count(DISTINCT xn) AS BIGINT) AS ndx,
         |    CAST(max(toks) AS BIGINT) AS total_tokens,
         |    CAST(max(voc) AS BIGINT) AS total_vocab,
         |    CAST(sum(xn) AS BIGINT) AS sx,
         |    CAST(sum(yn) AS BIGINT) AS sy,
         |    CAST(sum(xxn) AS BIGINT) AS sxx,
         |    CAST(sum(xyn) AS BIGINT) AS sxy
         |  FROM cells),
         |g AS (SELECT *, n_points::DOUBLE * sxx::DOUBLE / 1e9 -
         |    (sx::DOUBLE / 1e9) * (sx::DOUBLE / 1e9) AS den FROM s)
         |SELECT n_points, total_tokens, total_vocab,
         |  CASE WHEN n_points >= 3 AND ndx >= 2 AND den > 0 THEN
         |    round((n_points::DOUBLE * sxy::DOUBLE / 1e9 -
         |      (sx::DOUBLE / 1e9) * (sy::DOUBLE / 1e9)) / den, 6) END
         |    AS heaps_beta,
         |  CASE WHEN n_points >= 3 AND ndx >= 2 AND den > 0 THEN
         |    round((sy::DOUBLE / 1e9 -
         |      ((n_points::DOUBLE * sxy::DOUBLE / 1e9 -
         |        (sx::DOUBLE / 1e9) * (sy::DOUBLE / 1e9)) / den) *
         |      sx::DOUBLE / 1e9) / n_points, 6) END AS heaps_ln_k
         |FROM g""".stripMargin)
}
