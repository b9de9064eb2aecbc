package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Anomaly, Constraints}

/** Round-5 additions, part eight — the data-OBSERVABILITY completion
  * batch, the closest to the reference's own purpose (databand is a
  * data-observability platform; its templates log per-run stats and
  * leave pass/fail judgement to the platform — these operators ARE that
  * judgement layer):
  *
  *  - q109 Deequ-style declarative constraint suite, ONE aggregate pass
  *  - q110 referential-integrity audit (orphans + coverage), key
  *    relations only ever meet — never data rows
  *  - q111 daily volume anomaly via exact integer median/MAD
  *  - q112 Benford first-digit test (fabricated-amount detector)
  *  - q113 per-group MAD robust outlier census
  *
  * Oracle conventions as everywhere: integer metrics (violation
  * counts, doubled medians, quadrupled MADs), basis-point ratios
  * rounded to 4 dp, robust z rounded to 6 dp BEFORE comparison, and
  * the Benford expectation pinned as shared 4-dp literals so no
  * cross-engine log10 enters the compare.
  *
  * To keep Spark rules and oracle SQL in lockstep, each constraint is
  * declared ONCE below as (Rule, SQL violation expression) and both
  * sides are generated from that list.
  */
object Round5hQueries {

  /** q109 rule suite over `orders` — two rules bind at every SF:
    * `unique(o_custkey)` (customers repeat across orders) and
    * `bounds(o_totalprice ≤ 400000)` (the fixture's max is ~500k).
    */
  val OrderRules: Seq[(Constraints.Rule, String)] = Seq(
    Constraints.complete("o_custkey") ->
      "sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)",
    Constraints.complete("o_totalprice") ->
      "sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)",
    Constraints.unique("o_orderkey") ->
      "count(*) - count(DISTINCT o_orderkey)",
    Constraints.unique("o_custkey") ->
      "count(*) - count(DISTINCT o_custkey)",
    Constraints.inSet("o_orderstatus", Seq("O", "F", "P")) ->
      ("sum(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus " +
        "NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)"),
    Constraints.matches("o_orderpriority", "^[1-5]-") ->
      ("sum(CASE WHEN o_orderpriority IS NOT NULL AND NOT " +
        "regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END)"),
    Constraints.bounds("o_totalprice", 0.0, 400000.0) ->
      ("sum(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0.0 " +
        "OR o_totalprice > 400000.0) THEN 1 ELSE 0 END)"))

  /** q110 audited FK pairs: (child, fk, parent, pk). The
    * events.user_id → customer pair binds on coverage (90% of
    * customers never appear in the event log).
    */
  val FkPairs: Seq[(String, String, String, String)] = Seq(
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("events", "user_id", "customer", "c_custkey"))

  /** q118 DISCOVERY candidates: the three true FKs, one spurious
    * direction (orderkey "into" custkey: containment collapses to 10%),
    * and one reversed pair whose parent column is NON-unique — so both
    * report axes (containment, parent key-ness) separate signal from
    * noise at every SF.
    */
  val FkCandidates: Seq[(String, String, String, String)] = Seq(
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_orderkey", "customer", "c_custkey"),
    ("customer", "c_custkey", "orders", "o_custkey"))

  val VolumeK = 2.0 // binds at sf0.01: 2 of 30 days flagged
  val OutlierK = 2.0 // binds at sf0.01 on several sources

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_constraints" -> ((s, dir) =>
      Constraints.check(Tables.load(s, dir, "orders"),
        OrderRules.map(_._1))),

    "q110_ref_integrity" -> ((s, dir) =>
      Constraints.refIntegritySuite(FkPairs.map { case (c, fk, p, pk) =>
        (Tables.load(s, dir, c), c, fk, Tables.load(s, dir, p), p, pk)
      })),

    "q118_fk_discovery" -> ((s, dir) =>
      Constraints.fkDiscovery(FkCandidates.map { case (c, fk, p, pk) =>
        (Tables.load(s, dir, c), c, fk, Tables.load(s, dir, p), p, pk)
      })),

    "q111_volume_anomaly" -> ((s, dir) =>
      Anomaly.dailyVolumeAnomaly(Tables.load(s, dir, "events"), "ts",
        VolumeK)),

    "q112_benford" -> ((s, dir) =>
      Anomaly.benfordReport(Tables.load(s, dir, "orders"),
        "o_totalprice")),

    "q113_mad_outliers" -> ((s, dir) =>
      Anomaly.madOutliers(Tables.load(s, dir, "documents"), "source",
        "n_chars", OutlierK)))

  private def constraintsOracle: String = {
    val metrics = OrderRules.zipWithIndex.map { case ((_, sql), i) =>
      s"    CAST($sql AS BIGINT) AS m$i"
    }.mkString(",\n")
    val rows = OrderRules.zipWithIndex.map { case ((r, _), i) =>
      s"  SELECT '${r.rule}' AS rule, '${r.column}' AS col_name, " +
        s"n, m$i AS v FROM s"
    }.mkString("\n  UNION ALL\n")
    s"""WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |$metrics
       |  FROM orders),
       |r AS (
       |$rows
       |)
       |SELECT rule, col_name, n AS n_rows, v AS n_violations,
       |  CASE WHEN n > 0 THEN round(v * 10000.0 / n, 4) END
       |    AS violation_bp,
       |  v = 0 AS passed
       |FROM r ORDER BY rule, col_name""".stripMargin
  }

  private def refIntegrityOracle: String = {
    val pairCtes = FkPairs.zipWithIndex.map { case ((c, fk, p, pk), i) =>
      s"""ck$i AS (SELECT $fk AS k, count(*) AS c FROM $c
         |  WHERE $fk IS NOT NULL GROUP BY 1),
         |pk$i AS (SELECT DISTINCT $pk AS k FROM $p),
         |j$i AS (SELECT ck$i.k AS ck, ck$i.c AS c, pk$i.k AS pk
         |  FROM ck$i FULL OUTER JOIN pk$i ON ck$i.k = pk$i.k),
         |a$i AS (SELECT
         |    CAST(coalesce(sum(CASE WHEN pk IS NULL THEN c END), 0)
         |      AS BIGINT) AS orph,
         |    CAST(sum(CASE WHEN pk IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS pkeys,
         |    CAST(sum(CASE WHEN pk IS NOT NULL AND ck IS NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS unref
         |  FROM j$i),
         |b$i AS (SELECT CAST(count(*) AS BIGINT) AS nrows,
         |    CAST(sum(CASE WHEN $fk IS NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nnulls
         |  FROM $c)""".stripMargin
    }.mkString(",\n")
    val rows = FkPairs.zipWithIndex.map { case ((c, fk, p, pk), i) =>
      s"""  SELECT '$c' AS child_table, '$fk' AS fk,
         |    '$p' AS parent_table, '$pk' AS pk,
         |    nrows AS n_child_rows, nnulls AS n_null_fk,
         |    orph AS n_orphan_rows,
         |    CASE WHEN nrows > 0
         |      THEN round(orph * 10000.0 / nrows, 4) END AS orphan_bp,
         |    pkeys AS n_parent_keys, unref AS n_unreferenced,
         |    CASE WHEN pkeys > 0
         |      THEN round(unref * 10000.0 / pkeys, 4) END
         |      AS unreferenced_bp
         |  FROM a$i, b$i""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH $pairCtes
       |$rows
       |ORDER BY child_table, fk""".stripMargin
  }

  private def volumeOracle: String =
    s"""WITH d AS (SELECT CAST(ts AS DATE) AS dd,
       |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
       |m AS (SELECT CAST(round(2 * median(n)) AS BIGINT) AS med2 FROM d),
       |d2 AS (SELECT dd, n, med2, abs(2 * n - med2) AS dev2 FROM d, m),
       |md AS (SELECT CAST(round(2 * median(dev2)) AS BIGINT) AS mad4
       |  FROM d2)
       |SELECT CAST(dd AS VARCHAR) AS day, n AS n_events,
       |  round(med2 / 2.0, 1) AS median_events,
       |  round(mad4 / 4.0, 2) AS mad_events,
       |  CASE WHEN mad4 > 0
       |    THEN round(2.0 * dev2 / (1.4826 * mad4), 6) END AS robust_z,
       |  CASE WHEN mad4 > 0
       |    THEN round(2.0 * dev2 / (1.4826 * mad4), 6) > $VolumeK
       |    ELSE dev2 > 0 END AS is_anomaly
       |FROM d2, md ORDER BY day""".stripMargin

  private def benfordOracle: String = {
    val values = Anomaly.BenfordExpectedBp
      .map { case (d, bp) => f"($d, $bp%.4f)" }.mkString(", ")
    s"""WITH e AS (SELECT * FROM (VALUES $values) AS t(digit, exp_bp)),
       |o AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM orders
       |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0 GROUP BY 1),
       |t AS (SELECT sum(n) AS tt FROM o)
       |SELECT e.digit, CAST(coalesce(o.n, 0) AS BIGINT) AS n,
       |  CASE WHEN tt > 0
       |    THEN round(coalesce(o.n, 0) * 10000.0 / tt, 4) END AS obs_bp,
       |  CAST(e.exp_bp AS DOUBLE) AS exp_bp,
       |  round((CASE WHEN tt > 0
       |      THEN round(coalesce(o.n, 0) * 10000.0 / tt, 4) END)
       |    - e.exp_bp, 4) AS dev_bp
       |FROM e LEFT JOIN o USING (digit), t ORDER BY e.digit""".stripMargin
  }

  private def madOutliersOracle: String =
    s"""WITH v AS (SELECT source AS g, n_chars AS v FROM documents
       |  WHERE n_chars IS NOT NULL),
       |m AS (SELECT g, CAST(round(2 * median(v)) AS BIGINT) AS med2
       |  FROM v GROUP BY 1),
       |d AS (SELECT v.g, v.v, m.med2, abs(2 * v.v - m.med2) AS dev2
       |  FROM v JOIN m USING (g)),
       |md AS (SELECT g, CAST(round(2 * median(dev2)) AS BIGINT) AS mad4
       |  FROM d GROUP BY 1),
       |s AS (SELECT d.g, d.med2, d.dev2, md.mad4,
       |    CASE WHEN md.mad4 > 0
       |      THEN round(2.0 * d.dev2 / (1.4826 * md.mad4), 6) END AS z
       |  FROM d JOIN md USING (g))
       |SELECT g AS source, CAST(count(*) AS BIGINT) AS n_rows,
       |  round(any_value(med2) / 2.0, 1) AS median,
       |  round(any_value(mad4) / 4.0, 2) AS mad,
       |  CAST(sum(CASE WHEN (CASE WHEN mad4 > 0 THEN z > $OutlierK
       |      ELSE dev2 > 0 END) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_outliers,
       |  round(sum(CASE WHEN (CASE WHEN mad4 > 0 THEN z > $OutlierK
       |      ELSE dev2 > 0 END) THEN 1 ELSE 0 END) * 10000.0 / count(*),
       |    4) AS outlier_bp,
       |  max(z) AS max_robust_z
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  private def fkDiscoveryOracle: String = {
    val rows = FkCandidates.zipWithIndex.map { case ((c, fk, p, pk), i) =>
      s"""  SELECT '$c' AS child_table, '$fk' AS fk,
         |    '$p' AS parent_table, '$pk' AS pk,
         |    (SELECT CAST(count(*) AS BIGINT) FROM ck$i) AS n_child_keys,
         |    (SELECT CAST(count(*) AS BIGINT) FROM ck$i
         |      WHERE k IN (SELECT k FROM pk$i)) AS n_contained,
         |    CASE WHEN (SELECT count(*) FROM ck$i) > 0
         |      THEN round((SELECT count(*) FROM ck$i
         |          WHERE k IN (SELECT k FROM pk$i)) * 10000.0
         |        / (SELECT count(*) FROM ck$i), 4) END AS containment_bp,
         |    (SELECT CAST(count(*) AS BIGINT) FROM $p) AS n_parent_rows,
         |    (SELECT CAST(count(DISTINCT $pk) AS BIGINT) FROM $p)
         |      AS n_parent_keys,
         |    (SELECT count(DISTINCT $pk) FROM $p)
         |      = (SELECT count(*) FROM $p) AS parent_unique""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val ctes = FkCandidates.zipWithIndex.map { case ((c, fk, p, pk), i) =>
      s"""ck$i AS (SELECT DISTINCT $fk AS k FROM $c
         |  WHERE $fk IS NOT NULL),
         |pk$i AS (SELECT DISTINCT $pk AS k FROM $p
         |  WHERE $pk IS NOT NULL)""".stripMargin
    }.mkString(",\n")
    s"""WITH $ctes
       |$rows
       |ORDER BY child_table, fk, parent_table, pk""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q118_fk_discovery" -> fkDiscoveryOracle,
    "q109_constraints" -> constraintsOracle,
    "q110_ref_integrity" -> refIntegrityOracle,
    "q111_volume_anomaly" -> volumeOracle,
    "q112_benford" -> benfordOracle,
    "q113_mad_outliers" -> madOutliersOracle)
}
