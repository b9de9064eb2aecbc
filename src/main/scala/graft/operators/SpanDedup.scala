package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT duplicated-SPAN detection across a corpus — the substring-level
  * complement of the document-level dedup family (MinHash/SimHash/
  * fingerprint drop whole documents; this finds the duplicated RUNS
  * inside otherwise-distinct documents, the operator behind
  * "deduplicating training data" span removal: boilerplate headers,
  * licence blocks, templated paragraphs).
  *
  * Method (public: Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better" — the ExactSubstr idea re-expressed
  * relationally; their suffix array is a single-machine structure, the
  * Spark-shaped equivalent is a positioned window-hash census):
  *
  *  1. every L-token window of every document hashes to
  *     (doc_id, pos, h) — h the house rolling PolyHash over the
  *     space-joined window, the [[Dedup.shingled]] convention with
  *     POSITIONS kept;
  *  2. one global census groups by h: windows whose hash occurs ≥ 2
  *     times anywhere (other docs OR the same doc) are duplicated; the
  *     lexicographically first occurrence (min doc_id, then min pos) is
  *     the CANONICAL copy and stays;
  *  3. every other occurrence is flagged, and per doc the flagged
  *     windows — each covering token positions [pos, pos+L) — merge
  *     into maximal spans by the island rule (a window extends the
  *     current span iff its start sits at or inside the running
  *     covered end).
  *
  * Scale shape: the census is ONE hash-keyed aggregate (map-side
  * combine; no key joins back to more than one census row, so hot
  * "stop windows" fan nothing out); the island merge sorts only each
  * doc's flagged windows (doc-bounded, never corpus-bounded). All
  * arithmetic is exact integers — position algebra and counts — so the
  * DuckDB oracle replays it bit-for-bit.
  */
object SpanDedup {

  /** (doc_id, pos, h): the rolling hash of every L-token window.
    * Documents shorter than L tokens contribute nothing. One native
    * byte scan per doc ([[graft.functions.PositionedWindowHashes]],
    * codegen'd) — no per-window string materialization, no interpreted
    * lambda dispatch; values ≡ the built-ins formulation
    * (differentially spec-pinned) and the oracle's
    * `rollhash(array_to_string(list_slice(...)))`.
    */
  def windowHashes(docs: DataFrame, l: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(l >= 2, "window length")
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.PositionedWindowHashes
          .positionedWindowHashes(col(textCol), l).as("hs"))
      .where(size(col("hs")) > 0)
      .select(col("doc_id"), posexplode(col("hs")))
      .toDF("doc_id", "pos", "h")
  }

  /** Flagged (non-canonical) duplicated windows: (doc_id, pos). */
  private def extraWindows(wh: DataFrame): DataFrame = {
    val census = wh.groupBy("h")
      .agg(count(lit(1)).as("c"), min(struct("doc_id", "pos")).as("first"))
      .filter(col("c") >= 2)
      .select(col("h"), col("first.doc_id").as("fd"),
        col("first.pos").as("fp"))
    wh.join(census, Seq("h"))
      .filter(col("doc_id") =!= col("fd") || col("pos") =!= col("fp"))
      .select("doc_id", "pos")
  }

  /** Maximal duplicated spans per document: (doc_id, span_start,
    * span_end, n_windows) with token positions [span_start, span_end)
    * half-open. The canonical first occurrence of each window is NOT a
    * span — only the copies are.
    */
  def duplicatedSpans(docs: DataFrame, l: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    mergeSpans(extraWindows(windowHashes(docs, l, idCol, textCol)), l)

  /** Island merge of flagged (doc_id, pos) windows into maximal spans:
    * a window EXTENDS the current span iff its coverage [pos, pos+L)
    * overlaps or touches the running covered end [.., max(prev pos)+L)
    * — i.e. a new span starts only past a strictly positive gap
    * (pos > prev_max + L). Touching regions merge because two
    * back-to-back duplicated runs are one contiguous duplicated region
    * for removal purposes. The sort is doc-bounded.
    */
  private def mergeSpans(ex: DataFrame, l: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val isles = ex
      .withColumn("prev_max", max(col("pos")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("prev_max").isNull ||
          col("pos") > col("prev_max") + l, 1L).otherwise(0L))
      .withColumn("span_id", sum("new_span").over(byDoc))
    isles.groupBy(col("doc_id"), col("span_id"))
      .agg(min("pos").as("span_start"),
        (max("pos") + l).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** Corpus spans that appear in a REFERENCE set — span-level benchmark
    * decontamination, the removal-grade complement of
    * [[Decontaminate.overlapScores]]' doc-level shingle overlap: a
    * corpus window flags iff its hash occurs ANYWHERE in `reference`
    * (no canonical-first rule — the reference copy always wins), and
    * flagged windows island-merge into the spans an eval-set scrubber
    * would cut. Same scale shape as [[duplicatedSpans]] with the
    * census replaced by a semi-join against the reference's distinct
    * window hashes.
    */
  def spansAgainst(corpus: DataFrame, reference: DataFrame, l: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cw = windowHashes(corpus, l, idCol, textCol)
    val rw = windowHashes(reference, l, idCol, textCol)
      .select("h").distinct()
    mergeSpans(cw.join(rw, Seq("h")).select("doc_id", "pos"), l)
  }

  /** Plan-size cap for [[contaminatedTokens]]' literal reference array
    * (the randomProjection literal-plan convention): eval benchmarks
    * fit comfortably; a corpus-sized reference must use the
    * [[spansAgainst]] join tier instead. */
  val MaxInPlanRefHashes = 65536

  /** SCAN-STAGE contaminated-token counter — the second tier of span
    * decontamination for a DRIVER-BOUNDED reference (an eval benchmark,
    * not a second corpus): the reference window hashes materialize as
    * ONE literal array in the plan and each document reduces in a
    * single left fold over its positioned window hashes, accumulating
    * the size of the UNION of flagged coverages [pos, pos+L) — the
    * exact number [[spansAgainst]]' island merge sums, with no explode,
    * no join, no shuffle and no state, so the expression drops into a
    * streaming projection unchanged (continuous decontamination).
    * Per-window membership is a linear scan of the literal array —
    * that is the trade: O(|ref|) per window against the join tier's
    * census shuffle; the require caps |ref| at [[MaxInPlanRefHashes]].
    */
  def contaminatedTokens(text: Column, refHashes: Seq[Long],
      l: Int): Column = {
    require(l >= 2, "window length")
    require(refHashes.nonEmpty && refHashes.size <= MaxInPlanRefHashes,
      s"in-plan reference must be 1..$MaxInPlanRefHashes window hashes" +
        " — use spansAgainst (the join tier) for corpus-sized references")
    val ref = array(refHashes.distinct.map(lit): _*)
    val hs = graft.functions.PositionedWindowHashes
      .positionedWindowHashes(text, l)
    // fold state (prev_end, total): a flagged window at position i adds
    // (i+L) − max(prev_end, i) new covered tokens and advances the
    // covered end to i+L (positions arrive in order, so the running
    // max IS prev_end) — the union size, identical to the island sum
    val indexed = zip_with(hs,
      sequence(lit(0), greatest(size(hs) - 1, lit(0))),
      (h, i) => struct(h.as("h"), i.as("i")))
    aggregate(indexed,
      struct(lit(0L).as("pe"), lit(0L).as("tot")),
      (st, x) => when(array_contains(ref, x("h")),
        struct(
          (x("i") + l).cast("long").as("pe"),
          (st("tot") + (x("i") + l) -
            greatest(st("pe"), x("i").cast("long"))).as("tot")))
        .otherwise(st),
      st => st("tot"))
  }

  /** [[decontReport]]'s scan-stage twin over [[contaminatedTokens]]:
    * same output schema and — by construction — the same values, with
    * the reference collected once to the driver. The differential pair
    * (join tier ↔ fold tier) shares one oracle.
    */
  def decontReportScan(corpus: DataFrame, reference: DataFrame,
      groupCol: String, l: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val refHashes = graft.util.Guards.countedCollect(
        windowHashes(reference, l, idCol, textCol).select("h").distinct(),
        "decontReportScan", cap = MaxInPlanRefHashes.toLong)
      .map(_.getLong(0)).toSeq
    // an empty reference (every ref doc shorter than l tokens) yields
    // zero window hashes: nothing can be contaminated, so short-circuit
    // to bad = 0 — the join tier returns the same clean report on this
    // edge and the differential pair must agree
    val badCol =
      if (refHashes.isEmpty) lit(0L)
      else contaminatedTokens(col(textCol), refHashes, l)
    corpus
      .select(col(groupCol).as("g"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
        badCol.as("bad"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bad") > 0, 1L).otherwise(0L))
          .as("docs_contaminated"),
        sum("n_tokens").as("total_tokens"),
        sum("bad").as("contaminated_tokens"))
      .select(col("g").as(groupCol), col("n_docs"),
        col("docs_contaminated"), col("total_tokens"),
        col("contaminated_tokens"),
        expr("(contaminated_tokens * 1000000) div total_tokens")
          .as("contaminated_ppm"))
      .orderBy(groupCol)
  }

  /** Per-group span-decontamination rollup: (group, n_docs,
    * docs_contaminated, total_tokens, contaminated_tokens,
    * contaminated_ppm) of `corpus` against `reference`.
    */
  def decontReport(corpus: DataFrame, reference: DataFrame,
      groupCol: String, l: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = spansAgainst(corpus, reference, l, idCol, textCol)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start")).as("bad_tokens"))
    val base = corpus.select(col(groupCol).as("g"),
      col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    base.join(spans, Seq("doc_id"), "left")
      .groupBy("g")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bad_tokens").isNotNull, 1L).otherwise(0L))
          .as("docs_contaminated"),
        sum("n_tokens").as("total_tokens"),
        sum(coalesce(col("bad_tokens"), lit(0L)))
          .as("contaminated_tokens"))
      .select(col("g").as(groupCol), col("n_docs"),
        col("docs_contaminated"), col("total_tokens"),
        col("contaminated_tokens"),
        expr("(contaminated_tokens * 1000000) div total_tokens")
          .as("contaminated_ppm"))
      .orderBy(groupCol)
  }

  /** Per-document duplication report, docs with ≥1 flagged span only:
    * (doc_id, n_tokens, n_spans, dup_windows, dup_tokens, dup_ppm) —
    * dup_tokens = Σ span lengths (spans are disjoint by construction),
    * dup_ppm the exact floor share of the doc's tokens sitting in a
    * duplicated copy.
    */
  def docReport(docs: DataFrame, l: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = duplicatedSpans(docs, l, idCol, textCol)
    val perDoc = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum("n_windows").as("dup_windows"),
        sum(col("span_end") - col("span_start")).as("dup_tokens"))
    val sizes = docs.select(col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    perDoc.join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("dup_windows"), col("dup_tokens"),
        expr("(dup_tokens * 1000000) div n_tokens").as("dup_ppm"))
      .orderBy("doc_id")
  }

  /** Per-group rollup — the corpus-health number a pretraining pipeline
    * tracks per source: (group, n_docs, docs_flagged, total_tokens,
    * dup_tokens, dup_ppm).
    */
  def report(docs: DataFrame, groupCol: String, l: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spans = duplicatedSpans(docs, l, idCol, textCol)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start")).as("dup_tokens"))
    val base = docs.select(col(groupCol).as("g"), col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
    base.join(spans, Seq("doc_id"), "left")
      .groupBy("g")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dup_tokens").isNotNull, 1L).otherwise(0L))
          .as("docs_flagged"),
        sum("n_tokens").as("total_tokens"),
        sum(coalesce(col("dup_tokens"), lit(0L))).as("dup_tokens"))
      .select(col("g").as(groupCol), col("n_docs"), col("docs_flagged"),
        col("total_tokens"), col("dup_tokens"),
        expr("(dup_tokens * 1000000) div total_tokens").as("dup_ppm"))
      .orderBy(groupCol)
  }

  /** Span REMOVAL — the scrubbed corpus itself: per doc, the tokens
    * outside every duplicated span, emitted as (doc_id, n_tokens,
    * kept_tokens, kept_hash) where kept_hash is the rolling hash of the
    * space-joined kept sequence — the exact fingerprint a downstream
    * re-ingest can verify against. Docs with no spans pass through
    * (kept_tokens = n_tokens, hash of the full token sequence).
    */
  def scrub(docs: DataFrame, l: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = duplicatedSpans(docs, l, idCol, textCol)
      .groupBy("doc_id")
      .agg(collect_list(struct("span_start", "span_end")).as("spans"))
    val base = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("ws"))
    base.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        filter(
          transform(col("ws"),
            (w, i) => when(
              coalesce(exists(col("spans"),
                s => i >= s("span_start") && i < s("span_end")),
                lit(false)), lit(null).cast("string")).otherwise(w)),
          w => w.isNotNull).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("kept")).cast("long").as("kept_tokens"),
        TextOps.rollingHash(concat_ws(" ", col("kept"))).as("kept_hash"))
      .orderBy("doc_id")
  }
}
