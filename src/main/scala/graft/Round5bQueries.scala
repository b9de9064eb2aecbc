package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, Export, Multimodal}

/** Round-5 additions, part two: the corpus-statistics quality operators
  * (boilerplate-by-document-frequency q72, corpus-unigram LM scoring
  * q73), cross-corpus near-dup ingest (q74 — the fuzzy twin of q67),
  * deterministic training-export sharding (q75), and the pairwise
  * source-overlap matrix (q76).
  *
  * Oracle conventions as in [[LlmQueries]]: identical aliases, identical
  * rounding (round 4 after the aggregate), deterministic total ORDER BY
  * on both sides, thresholds chosen so they BIND at the sf0.01 gate
  * (each flag/filter separates real rows, not the trivially-empty case).
  */
object Round5bQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** q72's document-frequency floor: 4% of the corpus (integer floor,
    * min 2), derived from the corpus size so the definition is
    * scale-free; at sf0.01 (500 docs) this is 20, where the fixture's
    * ratio spread is real (0.79–1.0).
    */
  def boilerMinDf(nDocs: Long): Long = math.max(nDocs * 4L / 100L, 2L)

  /** q72's flag threshold: docs whose shingles are ≥98% corpus-frequent
    * (183 of 500 at sf0.01 — binding, not all-or-nothing).
    */
  val BoilerThreshold = 0.98

  /** q73's surprisal threshold: fixture per-doc avg NLL spans 3.38–3.70
    * nats; 3.42 flags the rare-token tail (27 of 500 docs).
    */
  val NllThreshold = 3.42

  /** q75's export geometry: 8 shards, seed 7 (any seed re-shuffles). */
  val ExportShards = 8
  val ExportSeed = 7L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Boilerplate by shingle document-frequency (the CCNet/C4 signal):
    // per-source mean boilerplate ratio and the count of template-heavy
    // docs. Two shingle-keyed shuffles + one doc-keyed re-aggregate;
    // the df floor derives from ONE driver-side count scalar.
    "q72_boilerplate" -> ((s, dir) => {
      val d = docs(s, dir)
      val minDf = boilerMinDf(d.count())
      CorpusStats.boilerplateScores(d, minDf)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("boiler_ratio"), 4).as("avg_boiler_ratio"),
          sum(when(col("boiler_ratio") >= BoilerThreshold, 1L).otherwise(0L))
            .as("n_boiler_docs"))
        .orderBy("source")
    }),

    // Corpus-unigram LM scoring (the sandbox-honest KenLM stand-in):
    // per-source mean surprisal and the rare-token-tail count. The
    // vocabulary is one token-keyed aggregate; T rides a broadcast stat
    // row; no windows.
    "q73_unigram_lm" -> ((s, dir) =>
      CorpusStats.unigramNll(docs(s, dir))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("avg_nll"), 4).as("avg_nll"),
          sum(when(col("avg_nll") >= NllThreshold, 1L).otherwise(0L))
            .as("n_surprising"))
        .orderBy("source")),

    // Cross-corpus near-dup ingest: the doc_id % BenchMod == 0 slice
    // plays the already-ingested corpus (as in q67); incoming docs that
    // MinHash-LSH-collide with it and verify at Jaccard ≥ 0.5 are
    // near-known. Only band relations cross corpora — never text.
    "q74_incremental_neardup" -> ((s, dir) => {
      val d = docs(s, dir)
      val existing = d.filter(col("doc_id") % Round3Queries.BenchMod === 0)
      val incoming = d.filter(col("doc_id") % Round3Queries.BenchMod =!= 0)
      val nearIds = Dedup.incrementalNearDups(incoming, existing)
        .select("doc_id").distinct().withColumn("__near", lit(1L))
      incoming.join(nearIds, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_incoming"),
          sum(coalesce(col("__near"), lit(0L))).as("n_near_known"))
        .withColumn("n_novel", col("n_incoming") - col("n_near_known"))
        .orderBy("source")
    }),

    // Deterministic training-export manifest: per-shard row/char totals
    // and the first/last doc in stream order — aggregate-only (struct
    // min/max argmin), no window, no global sort.
    "q75_export_shards" -> ((s, dir) =>
      Export.shardStats(docs(s, dir), ExportShards, ExportSeed)
        .orderBy("shard")),

    // Pairwise source-overlap matrix: distinct-shingle intersection and
    // Jaccard for every unordered source pair (zero-overlap pairs
    // included). Per-shingle join fan-out ≤ (S choose 2), independent
    // of corpus size; the size relation broadcasts.
    "q76_source_overlap" -> ((s, dir) =>
      CorpusStats.sourceOverlap(docs(s, dir))
        .orderBy("source_a", "source_b")),

    // Duplicated-span coverage (substring-dedup criterion): fraction of
    // each doc's tokens covered by 8-token spans occurring in >= 2 docs;
    // per-source mean and span-duplicate-heavy doc counts. Shingle-keyed
    // aggregate + semi-join; interval union under a doc_id window.
    "q78_span_coverage" -> ((s, dir) =>
      CorpusStats.spanCoverage(docs(s, dir), SpanK)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("dup_coverage"), 4).as("avg_coverage"),
          sum(when(col("dup_coverage") >= SpanHeavyThreshold, 1L)
            .otherwise(0L)).as("n_dup_heavy"))
        .orderBy("source")),

    // Perceptual-hash near-dup over multimodal payloads: 60-bit aHash
    // per payload (byte-stream path on the text-byte fixture), banded
    // Hamming pairing, pair counts by distance. The fixture's closest
    // payloads sit at Hamming 4-5, so maxHamming=5 BINDS (6 pairs) and
    // the 6-band pigeonhole guarantee (5 < 6) makes the pair set exact.
    "q77_phash_neardup" -> ((s, dir) =>
      Multimodal.imageNearDups(
        Multimodal.synthesizePayloads(docs(s, dir)), PhashMaxHamming)
        .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
        .orderBy("hamming")))

  /** q77's Hamming radius — binds at sf0.01 (closest fixture pairs are
    * at distance 4-5) while staying under the 6-band recall guarantee.
    */
  val PhashMaxHamming = 5

  /** q78's span length and heavy-doc threshold: 8-token spans flag the
    * near-dup copies (47 of 500 docs at sf0.01, all past 0.5 coverage)
    * without tripping on the fixture's shared small vocabulary the way
    * shorter spans would.
    */
  val SpanK = 8
  val SpanHeavyThreshold = 0.5

  val oracleSql: Map[String, String] = Map(
    "q72_boilerplate" -> {
      val tok = LlmQueries.tokSql
      val big = LlmQueries.bigramsSql
      s"""WITH t AS (SELECT doc_id, source, $tok AS ws FROM documents),
         |sh AS (SELECT doc_id, source, unnest($big) AS s FROM t),
         |md AS (SELECT greatest(count(*) * 4 // 100, 2) AS m FROM documents),
         |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
         |pd AS (SELECT sh.doc_id, count(*) AS n_sh,
         |    sum(CASE WHEN df.df >= md.m THEN 1 ELSE 0 END) AS n_freq
         |  FROM sh JOIN df USING (s), md GROUP BY sh.doc_id),
         |sc AS (SELECT d.source,
         |    CASE WHEN coalesce(pd.n_sh, 0) = 0 THEN 0.0
         |         ELSE round(pd.n_freq::DOUBLE / pd.n_sh, 4) END AS r
         |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  round(avg(r), 4) AS avg_boiler_ratio,
         |  CAST(sum(CASE WHEN r >= $BoilerThreshold THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_boiler_docs
         |FROM sc GROUP BY source ORDER BY source""".stripMargin
    },

    "q73_unigram_lm" -> {
      val tok = LlmQueries.tokSql
      s"""WITH tk AS (SELECT doc_id, source, unnest($tok) AS w FROM documents),
         |v AS (SELECT w, count(*)::DOUBLE AS cnt FROM tk GROUP BY w),
         |tt AS (SELECT sum(cnt) AS t FROM v),
         |sc AS (SELECT tk.doc_id, tk.source, ln(t / cnt) AS nll
         |  FROM tk JOIN v USING (w), tt),
         |pd AS (SELECT doc_id, source, round(avg(nll), 4) AS d_nll
         |  FROM sc GROUP BY doc_id, source)
         |SELECT source, count(*) AS n_docs, round(avg(d_nll), 4) AS avg_nll,
         |  CAST(sum(CASE WHEN d_nll >= $NllThreshold THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_surprising
         |FROM pd GROUP BY source ORDER BY source""".stripMargin
    },

    // The full-corpus pair CTEs (q34's chain) restricted to pairs that
    // straddle the corpus/delivery membership split — identical to the
    // operator's cross-only band join because signatures and bands are
    // per-document.
    "q74_incremental_neardup" -> {
      val mod = Round3Queries.BenchMod
      s"""WITH ${LlmQueries.minhashPairsCtes},
         |cr AS (SELECT CASE WHEN doc_a % $mod = 0 THEN doc_b ELSE doc_a END AS id
         |  FROM j WHERE jaccard >= 0.5
         |    AND ((doc_a % $mod = 0) <> (doc_b % $mod = 0))),
         |nd AS (SELECT DISTINCT id FROM cr),
         |inc AS (SELECT d.source,
         |    CASE WHEN nd.id IS NOT NULL THEN 1 ELSE 0 END AS near
         |  FROM documents d LEFT JOIN nd ON d.doc_id = nd.id
         |  WHERE d.doc_id % $mod <> 0)
         |SELECT source, count(*) AS n_incoming,
         |  CAST(sum(near) AS BIGINT) AS n_near_known,
         |  CAST(count(*) - sum(near) AS BIGINT) AS n_novel
         |FROM inc GROUP BY source ORDER BY source""".stripMargin
    },

    "q75_export_shards" -> {
      val m = operators.Sampling.HashMod
      s"""WITH h AS (SELECT doc_id, n_chars,
         |    (((doc_id + $ExportSeed) % $m) * 2654435761) % $m AS ord
         |  FROM documents),
         |s AS (SELECT doc_id, n_chars, ord, ord % $ExportShards AS shard FROM h),
         |fr AS (SELECT shard, doc_id AS fd, row_number() OVER
         |    (PARTITION BY shard ORDER BY ord, doc_id) AS rn FROM s),
         |lr AS (SELECT shard, doc_id AS ld, row_number() OVER
         |    (PARTITION BY shard ORDER BY ord DESC, doc_id DESC) AS rn FROM s)
         |SELECT s.shard, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_weight,
         |  min(fr.fd) AS first_doc, min(lr.ld) AS last_doc
         |FROM s JOIN fr ON s.shard = fr.shard AND fr.rn = 1
         |       JOIN lr ON s.shard = lr.shard AND lr.rn = 1
         |GROUP BY s.shard ORDER BY s.shard""".stripMargin
    },

    "q78_span_coverage" -> {
      val tok = LlmQueries.tokSql
      val k = SpanK
      s"""WITH t AS (SELECT doc_id, source, $tok AS ws FROM documents),
         |ps AS (SELECT doc_id, source, len(ws) AS n, i AS pos,
         |    array_to_string(ws[i+1:i+$k], ' ') AS sh
         |  FROM t CROSS JOIN unnest(range(0, greatest(len(ws) - $k + 1, 0)))
         |    AS u(i)),
         |dfq AS (SELECT sh, count(DISTINCT doc_id) AS df FROM ps GROUP BY sh),
         |dup AS (SELECT ps.doc_id, ps.source, ps.n, ps.pos
         |  FROM ps JOIN dfq USING (sh) WHERE df >= 2),
         |sw AS (SELECT doc_id, source, n, pos,
         |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM dup),
         |cv AS (SELECT doc_id, source, n,
         |    sum(CASE WHEN prev IS NULL THEN $k
         |             ELSE least($k, pos - prev) END) AS covered
         |  FROM sw GROUP BY doc_id, source, n),
         |al AS (SELECT d.source,
         |    CASE WHEN cv.covered IS NULL THEN 0.0
         |         ELSE round(cv.covered::DOUBLE / cv.n, 4) END AS cov
         |  FROM documents d LEFT JOIN cv ON d.doc_id = cv.doc_id)
         |SELECT source, count(*) AS n_docs, round(avg(cov), 4) AS avg_coverage,
         |  CAST(sum(CASE WHEN cov >= $SpanHeavyThreshold THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dup_heavy
         |FROM al GROUP BY source ORDER BY source""".stripMargin
    },

    // byteAHash mirrored over ascii codes (the payload is the UTF-8 text
    // bytes and the fixture text is pure ASCII — same caveat as q39's
    // oracle); banding identical to Dedup.hammingPairs' chunk arithmetic.
    "q77_phash_neardup" ->
      s"""WITH f AS (SELECT doc_id, list_transform(regexp_extract_all(text, '.'),
         |    c -> CAST(ascii(c) AS BIGINT)) AS codes FROM documents),
         |m AS (SELECT doc_id, codes, len(codes) AS n,
         |  CASE WHEN len(codes) = 0 THEN 0.0
         |       ELSE list_sum(codes)::DOUBLE / len(codes) END AS mu FROM f),
         |h AS (SELECT doc_id, CASE WHEN n = 0 THEN 0 ELSE
         |    list_sum(list_transform(range(0, 60), i ->
         |      CASE WHEN codes[(n * i) // 60 + 1] >= mu
         |           THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) ELSE 0 END))
         |  END AS ph FROM m),
         |b AS (SELECT doc_id, ph, unnest(range(0, 6)) AS bi FROM h),
         |bb AS (SELECT doc_id, ph, bi,
         |  (ph >> CAST(10 * bi AS INTEGER)) & 1023 AS bv FROM b),
         |cand AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db,
         |    a.ph AS pa, b2.ph AS pb
         |  FROM bb a JOIN bb b2 ON a.bi = b2.bi AND a.bv = b2.bv
         |    AND a.doc_id < b2.doc_id),
         |p AS (SELECT bit_count(xor(pa, pb)) AS hamming FROM cand
         |  WHERE bit_count(xor(pa, pb)) <= $PhashMaxHamming)
         |SELECT hamming, count(*) AS n_pairs FROM p
         |GROUP BY hamming ORDER BY hamming""".stripMargin,

    "q76_source_overlap" -> {
      val tok = LlmQueries.tokSql
      val big = LlmQueries.bigramsSql
      s"""WITH t AS (SELECT source, $tok AS ws FROM documents),
         |sh AS (SELECT DISTINCT source, s FROM
         |  (SELECT source, unnest($big) AS s FROM t)),
         |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
         |iv AS (SELECT a.source AS sa, b.source AS sb, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT x.source AS source_a, y.source AS source_b,
         |  x.n AS n_a, y.n AS n_b,
         |  CAST(coalesce(iv.c, 0) AS BIGINT) AS n_common,
         |  round(coalesce(iv.c, 0)::DOUBLE / (x.n + y.n - coalesce(iv.c, 0)), 4)
         |    AS jaccard
         |FROM sz x JOIN sz y ON x.source < y.source
         |LEFT JOIN iv ON iv.sa = x.source AND iv.sb = y.source
         |ORDER BY source_a, source_b""".stripMargin
    })
}
