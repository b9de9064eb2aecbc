package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Evaluation, TimeSeries}

/** Round-7 part seven: Chow structural-break test (did the TREND
  * change at the release) and split-conformal prediction intervals
  * (distribution-free "how wrong can this prediction be").
  */
object Round7lQueries {

  val ConformalAlphaPermille = 100L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_chow_break" -> ((s, dir) =>
      TimeSeries.chowTest(Tables.load(s, dir, "events"), "event_type",
        Round5fQueries.PsiCutoff)),

    "q209_conformal" -> ((s, dir) =>
      Evaluation.conformalReport(Tables.load(s, dir, "events"),
        "event_type", "value", "event_id", ConformalAlphaPermille)))

  val oracleSql: Map[String, String] = Map(
    "q208_chow_break" ->
      s"""WITH d AS (SELECT event_type AS key,
         |    date_trunc('day', ts)::DATE AS day,
         |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |b AS (SELECT min(day) AS day0 FROM d),
         |x AS (SELECT key, CAST(day - day0 AS BIGINT) AS x, y,
         |    CASE WHEN day < DATE '${Round5fQueries.PsiCutoff}'
         |      THEN 0 ELSE 1 END AS seg
         |  FROM d, b),
         |st AS (SELECT key, seg, CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
         |  FROM x GROUP BY 1, 2),
         |sp AS (SELECT key, CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
         |  FROM x GROUP BY 1),
         |j AS (SELECT a.key,
         |    a.n AS an, a.sx AS asx, a.sy AS asy, a.sxx AS asxx,
         |    a.sxy AS asxy, a.syy AS asyy,
         |    c.n AS bn, c.sx AS bsx, c.sy AS bsy, c.sxx AS bsxx,
         |    c.sxy AS bsxy, c.syy AS bsyy,
         |    p.n AS pn, p.sx AS psx, p.sy AS psy, p.sxx AS psxx,
         |    p.sxy AS psxy, p.syy AS psyy
         |  FROM st a JOIN st c ON a.key = c.key AND a.seg = 0
         |    AND c.seg = 1
         |  JOIN sp p ON p.key = a.key),
         |f AS (SELECT key,
         |    CAST(an AS BIGINT) AS n_pre, CAST(bn AS BIGINT) AS n_post,
         |    asxx::DOUBLE - asx::DOUBLE * asx::DOUBLE / an::DOUBLE
         |      AS sxxa,
         |    asxy::DOUBLE - asx::DOUBLE * asy::DOUBLE / an::DOUBLE
         |      AS sxya,
         |    asyy::DOUBLE - asy::DOUBLE * asy::DOUBLE / an::DOUBLE
         |      AS syya,
         |    bsxx::DOUBLE - bsx::DOUBLE * bsx::DOUBLE / bn::DOUBLE
         |      AS sxxb,
         |    bsxy::DOUBLE - bsx::DOUBLE * bsy::DOUBLE / bn::DOUBLE
         |      AS sxyb,
         |    bsyy::DOUBLE - bsy::DOUBLE * bsy::DOUBLE / bn::DOUBLE
         |      AS syyb,
         |    psxx::DOUBLE - psx::DOUBLE * psx::DOUBLE / pn::DOUBLE
         |      AS sxxp,
         |    psxy::DOUBLE - psx::DOUBLE * psy::DOUBLE / pn::DOUBLE
         |      AS sxyp,
         |    psyy::DOUBLE - psy::DOUBLE * psy::DOUBLE / pn::DOUBLE
         |      AS syyp,
         |    an::DOUBLE + bn::DOUBLE AS nt
         |  FROM j)
         |SELECT key AS event_type, n_pre, n_post,
         |  CASE WHEN sxxa > 0 THEN round(sxya / sxxa, 6) END AS slope_pre,
         |  CASE WHEN sxxb > 0 THEN round(sxyb / sxxb, 6) END
         |    AS slope_post,
         |  CASE WHEN n_pre >= 3 AND n_post >= 3 AND sxxa > 0
         |      AND sxxb > 0 AND ((syya - sxya * sxya / sxxa) +
         |        (syyb - sxyb * sxyb / sxxb)) > 0 THEN
         |    round((((syyp - sxyp * sxyp / sxxp) -
         |      (syya - sxya * sxya / sxxa) -
         |      (syyb - sxyb * sxyb / sxxb)) / 2.0) /
         |      (((syya - sxya * sxya / sxxa) +
         |        (syyb - sxyb * sxyb / sxxb)) / (nt - 4.0)), 6) END
         |    AS f_stat
         |FROM f ORDER BY event_type""".stripMargin,

    "q209_conformal" -> {
      val a = ConformalAlphaPermille
      val p = graft.operators.Sampling.HashMod
      s"""WITH b AS (SELECT event_type AS g,
         |    CAST(round(value * 1e6) AS BIGINT) AS vm,
         |    ((event_id % $p) * 2654435761) % $p % 2 = 0 AS cal
         |  FROM events),
         |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n_cal,
         |    CAST(sign(sum(vm)) * (abs(sum(vm)) // count(*)) AS BIGINT)
         |      AS mean_micro
         |  FROM b WHERE cal GROUP BY 1),
         |rc AS (SELECT b.g, abs(vm - mean_micro) AS r,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM b JOIN m ON m.g = b.g WHERE cal GROUP BY 1, 2),
         |q AS (SELECT rc.g, min(CASE WHEN cum >= rank THEN r END)
         |      AS qhat_micro
         |  FROM (SELECT g, r, sum(c) OVER (PARTITION BY g ORDER BY r
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |    FROM rc) rc
         |  JOIN (SELECT g, least(((n_cal + 1) * ${1000 - a} + 999)
         |      // 1000, n_cal) AS rank FROM m) k ON k.g = rc.g
         |  GROUP BY 1)
         |SELECT b.g AS event_type, m.n_cal,
         |  CAST(count(*) AS BIGINT) AS n_test, m.mean_micro,
         |  q.qhat_micro,
         |  CAST(sum(CASE WHEN abs(vm - mean_micro) <= qhat_micro
         |    THEN 1 ELSE 0 END) AS BIGINT) AS covered,
         |  CAST((sum(CASE WHEN abs(vm - mean_micro) <= qhat_micro
         |    THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT)
         |    AS coverage_ppm
         |FROM b JOIN m ON m.g = b.g JOIN q ON q.g = b.g
         |WHERE NOT cal GROUP BY 1, 2, 4, 5
         |ORDER BY event_type""".stripMargin
    })
}
