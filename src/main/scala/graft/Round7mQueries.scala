package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Concentration, CorpusConfig, Linkage}

/** Round-7 part eight: Fellegi–Sunter EM linkage weights and the
  * audience-overlap matrix.
  */
object Round7mQueries {

  val LinkFields = Seq("seg_eq", "bal_close", "key_close")

  /** SN bucket width in CENTS = the $500 bal_close threshold, so two
    * balance-close records are always same-or-adjacent bucket.
    */
  val LinkBucketCents = 50000L

  private def cust(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        (col("c_acctbal") * 100).cast("long").as("cents"))

  /** Agreement flags off a `a_*`/`b_*` pair relation. abs() keeps the
    * flags order-free: on the exact tier a < b always so this matches
    * the original directed forms verbatim; adjacent-bucket SN pairs
    * canonicalise by bucket, not id.
    */
  private def flags(p: DataFrame): DataFrame = p.select(
    (col("a_c_mktsegment") === col("b_c_mktsegment")).as("seg_eq"),
    (abs(col("a_cents") - col("b_cents")) < LinkBucketCents).as("bal_close"),
    (abs(col("b_c_custkey") - col("a_c_custkey")) < 10).as("key_close"))

  private def pairsAt(cfg: CorpusConfig)(s: SparkSession, dir: String): DataFrame =
    flags(cfg.linkagePairs(cust(s, dir), "c_nationkey", "cents",
      LinkBucketCents, "c_custkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Nation-blocked candidate pairs; EM learns per-field m/u and the
    // match prior in the micro-integer domain (2 rounds, one DAG).
    // ORACLE TIER: exact within-block pairs are quadratic in block
    // size by contract (see Linkage.blockedPairs scaladoc) — q210a is
    // the production tier a corpus-scale run ships.
    "q210_linkage_em" -> ((s, dir) =>
      Linkage.emWeights(pairsAt(CorpusConfig.Exact)(s, dir), LinkFields)),

    // Production blocking tier: sorted-neighborhood on (nation ×
    // acctbal bucket) — within-block pair growth drops from n² to
    // linear; the blocking BINDS at sf0.01 (fewer pairs than q210, so
    // the learned parameters differ) and the oracle rebuilds the same
    // bucket predicate.
    "q210a_linkage_em_sn" -> ((s, dir) =>
      Linkage.emWeights(pairsAt(CorpusConfig.Production)(s, dir),
        LinkFields)),

    // Which event types reach the same users — exact pairwise
    // intersections off the distinct (user, type) relation.
    "q211_audience_overlap" -> ((s, dir) =>
      Concentration.audienceOverlap(Tables.load(s, dir, "events"))))

  /** SQL twin of [[Linkage.gammaMicro]] given param SQL expressions. */
  private def gammaSql(lm: String, ms: Seq[String], us: Seq[String]): String = {
    val a = (s"($lm)::DOUBLE" +: LinkFields.zip(ms).map { case (f, m) =>
      s"(CASE WHEN $f THEN ($m)::DOUBLE ELSE 1000000 - ($m) END)"
    }).mkString(" * ")
    val b = (s"(1000000 - ($lm))::DOUBLE" +: LinkFields.zip(us).map {
      case (f, u) =>
        s"(CASE WHEN $f THEN ($u)::DOUBLE ELSE 1000000 - ($u) END)"
    }).mkString(" * ")
    s"CAST(round(($a) / (($a) + ($b)) * 1000000) AS BIGINT)"
  }

  /** One EM round: sums CTE `s$k` off `g$k`, params CTE `p$k`. */
  private def roundSql(k: Int): String = {
    val sums = LinkFields.map(f =>
      s"""    CAST(sum(CASE WHEN $f THEN CAST(g AS HUGEINT) ELSE 0 END)
         |      AS HUGEINT) AS sga_$f,
         |    CAST(sum(CASE WHEN $f THEN 1000000 ELSE 0 END) AS HUGEINT)
         |      AS sa_$f""".stripMargin).mkString(",\n")
    val ps = LinkFields.map(f =>
      s"""    CAST((sga_$f * 1000000) // greatest(sg, 1::HUGEINT)
         |      AS BIGINT) AS m_$f,
         |    CAST(((sa_$f - sga_$f) * 1000000) //
         |      greatest(n * 1000000 - sg, 1::HUGEINT) AS BIGINT)
         |      AS u_$f""".stripMargin).mkString(",\n")
    s"""s$k AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(CAST(g AS HUGEINT)) AS HUGEINT) AS sg,
       |$sums
       |  FROM g$k),
       |p$k AS (SELECT CAST(sg // n AS BIGINT) AS lm,
       |$ps
       |  FROM s$k)""".stripMargin
  }

  /** Full EM oracle given the candidate-pair CTE body (must produce
    * the three agreement flag columns).
    */
  private def emSql(prBody: String): String = {
    val g1 = gammaSql(Linkage.Lambda0.toString,
      LinkFields.map(_ => Linkage.M0.toString),
      LinkFields.map(_ => Linkage.U0.toString))
    val g2 = gammaSql("p1.lm", LinkFields.map(f => s"p1.m_$f"),
      LinkFields.map(f => s"p1.u_$f"))
    val gf = gammaSql("p2.lm", LinkFields.map(f => s"p2.m_$f"),
      LinkFields.map(f => s"p2.u_$f"))
    val outCols = LinkFields.map(f =>
      s"p2.m_$f AS ${f}_m_micro, p2.u_$f AS ${f}_u_micro")
      .mkString(",\n  ")
    s"""WITH pr AS ($prBody),
       |g1 AS (SELECT *, $g1 AS g FROM pr),
       |${roundSql(1)},
       |g2 AS (SELECT pr.*, $g2 AS g FROM pr, p1),
       |${roundSql(2)},
       |gf AS (SELECT $gf AS g FROM pr, p2),
       |fin AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CASE WHEN g > 500000 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_matched FROM gf)
       |SELECT fin.n_pairs, p2.lm AS lambda_micro,
       |  $outCols,
       |  fin.n_matched
       |FROM fin, p2""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q210_linkage_em" -> emSql(
      """SELECT
        |    a.c_mktsegment = b.c_mktsegment AS seg_eq,
        |    abs(a.c_acctbal - b.c_acctbal) < 500 AS bal_close,
        |    b.c_custkey - a.c_custkey < 10 AS key_close
        |  FROM customer a JOIN customer b
        |    ON a.c_nationkey = b.c_nationkey
        |    AND a.c_custkey < b.c_custkey""".stripMargin),

    // Sorted-neighborhood tier: same EM over pairs restricted to the
    // same-or-adjacent $500 acctbal bucket (DuckDB `//` truncates
    // toward zero exactly like Spark `div` — measured — so the bucket
    // keys agree verbatim, double-width zero bucket included).
    "q210a_linkage_em_sn" -> emSql(
      s"""WITH c AS (SELECT c_custkey AS k, c_nationkey AS nat,
         |      c_mktsegment AS seg, CAST(c_acctbal * 100 AS BIGINT)
         |        AS cents,
         |      CAST(c_acctbal * 100 AS BIGINT) // $LinkBucketCents AS bk
         |    FROM customer)
         |  SELECT a.seg = b.seg AS seg_eq,
         |    abs(a.cents - b.cents) < $LinkBucketCents AS bal_close,
         |    abs(b.k - a.k) < 10 AS key_close
         |  FROM c a JOIN c b ON a.nat = b.nat
         |    AND (b.bk = a.bk OR b.bk = a.bk + 1)
         |    AND (b.bk = a.bk + 1 OR a.k < b.k)""".stripMargin),

    "q211_audience_overlap" ->
      """WITH m AS (SELECT DISTINCT user_id AS u, event_type AS l
        |  FROM events),
        |s AS (SELECT l, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
        |b AS (SELECT a.l AS label_a, c.l AS label_b,
        |    CAST(count(*) AS BIGINT) AS n_both
        |  FROM m a JOIN m c ON a.u = c.u AND a.l < c.l
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b, sa.n AS n_a, sb.n AS n_b, n_both,
        |  CAST((n_both * 1000000) // (sa.n + sb.n - n_both) AS BIGINT)
        |    AS jaccard_ppm
        |FROM b JOIN s sa ON sa.l = label_a JOIN s sb ON sb.l = label_b
        |ORDER BY label_a, label_b""".stripMargin)
}
