package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{SketchRollup, TextOps}
import graft.storage.StorageMonitor

/** Round-10 additions: the count-min-sketch frequency tier (the
  * mergeable heavy-hitter sibling of q122's Misra-Gries and q153's HLL
  * rollup — the sketch a 100 TB deployment persists per slice and sums
  * to answer any window) and the small-files compaction planner (the
  * lakehouse maintenance step the reference's bucket monitor can only
  * observe the need for).
  */
object Round10Queries {

  /** CMS geometry: d hash rows × w buckets. w far above the fixture
    * vocabulary keeps collisions rare while the band (8× the expected
    * per-row collision mass N/w) stays certain-green; the BINDING
    * regime (tiny w, colliding mass) is spec-pinned in Round10fSpec,
    * not oracled — the fidelity flags there would depend on layout.
    */
  val CmsDepth = 3
  val CmsWidth = 8192
  val CmsTopK = 20
  val CmsBandNum = 8L

  /** Compaction target: 1 MiB bins over the fixture files — small
    * enough that several bins form at the gate SF, the same constant
    * on both engines at every scale.
    */
  val CompactTargetBytes = 1048576L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mergeable CMS frequency sketch graded against the exact top-20:
    // est >= exact always (a red = broken sketch), est <= exact + 8N/w.
    "q273_cms_heavy_hitters" -> ((s, dir) =>
      SketchRollup.cmsTopTokensChecked(Tables.load(s, dir, "documents"),
        CmsDepth, CmsWidth, CmsTopK, CmsBandNum)),

    // Next-fit compaction plan of the fixture directory at 1 MiB bins.
    // The inventory is filtered to .parquet files IN the query so both
    // engines see the same file set by construction (the oracle globs
    // '*.parquet'; the recursive inventory would also pick up sidecar
    // files and nested dirs a future fixture might grow).
    "q274_compaction_plan" -> ((s, dir) =>
      StorageMonitor.compactionPlan(
        StorageMonitor.inventory(s, Seq(dir))
          .filter(col("extension") === "parquet"), CompactTargetBytes)))

  /** DuckDB twin of [[SketchRollup.cmsBucket]]: the house mod-every-
    * step rolling hash of 'seed:token', reduced mod the width.
    */
  private def bucketSql(seedExpr: String, tokExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(regexp_extract_all($seedExpr || ':' || $tokExpr, '.'), " +
      s"ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % ${TextOps.HashMod}) % $CmsWidth"

  /** The same sf-dir glob convention as the q27/q28 storage oracles:
    * the gate runs with `graft.sf.dir` set by Verify, so DuckDB stats
    * the same files the inventory lists.
    */
  private def storageGlob =
    sys.props.getOrElse("graft.sf.dir", "/root/testdata/sf0.01") +
      "/*.parquet"

  val oracleSql: Map[String, String] = Map(
    "q273_cms_heavy_hitters" ->
      s"""WITH cen AS (SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(regexp_extract_all(lower(text),
         |    '[a-z0-9]+')) AS tok FROM documents) GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM cen),
         |sd AS (SELECT unnest(range(0, $CmsDepth)) AS seed),
         |cells AS (SELECT seed,
         |    ${bucketSql("seed::VARCHAR", "token")} AS bucket,
         |    CAST(sum(cnt) AS BIGINT) AS cell
         |  FROM cen, sd GROUP BY 1, 2),
         |cand AS (SELECT token, cnt FROM cen
         |  ORDER BY cnt DESC, token LIMIT $CmsTopK),
         |probes AS (SELECT c.token, c.cnt, s.seed,
         |    ${bucketSql("s.seed::VARCHAR", "c.token")} AS bucket
         |  FROM cand c, sd s),
         |est AS (SELECT p.token, p.cnt, min(cl.cell) AS est_cnt
         |  FROM probes p JOIN cells cl
         |    ON cl.seed = p.seed AND cl.bucket = p.bucket
         |  GROUP BY 1, 2)
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token)
         |    AS INTEGER) AS rank,
         |  token, cnt AS exact_cnt, est_cnt,
         |  (est_cnt >= cnt AND est_cnt <= cnt +
         |    (n_total * $CmsBandNum) // $CmsWidth) AS within_bound
         |FROM est, tot ORDER BY rank""".stripMargin,

    "q274_compaction_plan" ->
      s"""WITH inv AS (SELECT parse_filename(filename) AS file_name,
         |    CAST(size AS BIGINT) AS size_bytes
         |  FROM read_blob('$storageGlob')),
         |c AS (SELECT file_name, size_bytes,
         |    CAST(coalesce(sum(size_bytes) OVER (ORDER BY file_name
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before FROM inv),
         |b AS (SELECT *, cum_before // $CompactTargetBytes AS bin FROM c)
         |SELECT CAST(bin AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
         |  min(file_name) AS first_file, max(file_name) AS last_file
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)
}
