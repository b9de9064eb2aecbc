package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ-style check
  * block the reference's monitors log per run as ad-hoc assertions
  * (`/root/reference/DataFrames/databand_tracking_template.py:20-28`
  * logs stats and the caller eyeballs them; a production observability
  * pipeline wants machine-checkable pass/fail rules instead).
  *
  * Scale design: the whole suite compiles into ONE aggregate pass over
  * the table — every rule contributes a conditional-count expression to
  * a single `agg(...)`, the stat ROW is exploded into report rows
  * driver-side-free, and nothing but that one scan touches the data.
  * `unique` adds a `count(distinct)` which Catalyst plans as an Expand
  * branch inside the same scan (no second read). All metrics are BIGINT
  * violation counts, so the report is cross-engine exact by
  * construction.
  */
object Constraints {

  /** One rule = a name, the checked column, and a BIGINT aggregate
    * expression counting VIOLATING rows (0 ⇔ pass).
    */
  final case class Rule(rule: String, column: String, violations: Column)

  private def violRows(pred: Column): Column =
    sum(when(pred, 1L).otherwise(0L)).cast("long")

  /** Null rows violate. */
  def complete(c: String): Rule =
    Rule("complete", c, violRows(col(c).isNull))

  /** Rows beyond one per distinct value violate; NULL rows all violate
    * (`count(distinct)` ignores nulls, so `count(*) - count(distinct)`
    * charges each null row — the strict reading of a key constraint).
    */
  def unique(c: String): Rule =
    Rule("unique", c, (count(lit(1)) - countDistinct(col(c))).cast("long"))

  /** Non-null values outside the allowed set violate. */
  def inSet(c: String, values: Seq[String]): Rule =
    Rule("in_set", c,
      violRows(col(c).isNotNull && !col(c).isin(values: _*)))

  /** Non-null values not matching the (RE2-portable) regex violate.
    * Unanchored find semantics, like Spark `rlike` / DuckDB
    * `regexp_matches` — anchor explicitly when needed.
    */
  def matches(c: String, regex: String): Rule =
    Rule("pattern", c, violRows(col(c).isNotNull && !col(c).rlike(regex)))

  /** Non-null values outside [lo, hi] violate. */
  def bounds(c: String, lo: Double, hi: Double): Rule =
    Rule("bounds", c, violRows(col(c).isNotNull &&
      (col(c).cast("double") < lo || col(c).cast("double") > hi)))

  /** Run the suite: one scan, one aggregate, then the stat row unfolds
    * to `(rule, column, n_rows, n_violations, violation_bp, passed)` —
    * one report row per rule, ordered by (rule, column).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule suite")
    val metrics = rules.zipWithIndex.map { case (r, i) =>
      r.violations.as(s"__m$i")
    }
    val stat = df.agg(count(lit(1)).cast("long").as("__n"),
      metrics: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.rule).as("rule"), lit(r.column).as("column"),
        col(s"__m$i").as("n_violations"))
    }
    stat.select(col("__n"), explode(array(rows: _*)).as("__r"))
      .select(
        col("__r.rule").as("rule"),
        col("__r.column").as("col_name"),
        col("__n").as("n_rows"),
        col("__r.n_violations").as("n_violations"),
        when(col("__n") > 0,
          round(col("__r.n_violations") * lit(10000.0) / col("__n"), 4))
          .as("violation_bp"),
        (col("__r.n_violations") === 0L).as("passed"))
      .orderBy("rule", "col_name")
  }

  /** Referential-integrity audit for one FK → PK pair, BOTH directions:
    * orphan child rows (FK value absent from the parent) and
    * unreferenced parent keys (coverage — the direction that catches a
    * silently dead upstream).
    *
    * Scale design: each side reduces to its (key, count) relation FIRST
    * — fully parallel hash aggregates — and only those key relations
    * meet in ONE full-outer join, scanning child and parent exactly
    * once each. The child's null-FK rows ride the key relation as the
    * null bucket (they equi-match nothing, so they survive the join
    * unmatched) and every metric — row count, null count, orphans,
    * coverage — falls out of a single aggregate over the joined key
    * rows. A null FK is reported in `n_null_fk`, not as an orphan
    * (a completeness problem, not a referential one); null parent keys
    * are dropped, matching the oracle's `pk IS NOT NULL` arithmetic.
    */
  def refIntegrity(child: DataFrame, childName: String, fkCol: String,
      parent: DataFrame, parentName: String, pkCol: String): DataFrame = {
    val childKeys = child
      .groupBy(col(fkCol).as("__k"))
      .agg(count(lit(1)).cast("long").as("__ccnt"))
    val parentKeys = parent.select(col(pkCol).as("__k"))
      .where(col("__k").isNotNull).distinct()
      .withColumn("__p", lit(1))
    val joined = childKeys.join(parentKeys, Seq("__k"), "full_outer")
    joined.agg(
      coalesce(sum(col("__ccnt")), lit(0L)).cast("long").as("__rows"),
      coalesce(sum(when(col("__k").isNull, col("__ccnt"))), lit(0L))
        .cast("long").as("__nulls"),
      coalesce(sum(when(col("__k").isNotNull && col("__p").isNull,
        col("__ccnt"))), lit(0L)).cast("long").as("__orphans"),
      coalesce(sum(when(col("__p").isNotNull, 1L)), lit(0L))
        .cast("long").as("__parent_keys"),
      coalesce(sum(when(col("__p").isNotNull && col("__ccnt").isNull, 1L)),
        lit(0L)).cast("long").as("__unref"))
    .select(
      lit(childName).as("child_table"), lit(fkCol).as("fk"),
      lit(parentName).as("parent_table"), lit(pkCol).as("pk"),
      col("__rows").as("n_child_rows"),
      col("__nulls").as("n_null_fk"),
      col("__orphans").as("n_orphan_rows"),
      when(col("__rows") > 0,
        round(col("__orphans") * lit(10000.0) / col("__rows"), 4))
        .as("orphan_bp"),
      col("__parent_keys").as("n_parent_keys"),
      col("__unref").as("n_unreferenced"),
      when(col("__parent_keys") > 0,
        round(col("__unref") * lit(10000.0) / col("__parent_keys"), 4))
        .as("unreferenced_bp"))
  }

  /** FK-candidate DISCOVERY — the inference complement of
    * [[refIntegrity]] (which audits a KNOWN pair): for every candidate
    * `(child, fkCol, parent, pkCol)`, how much of the child's key
    * domain the parent covers, plus whether the parent column is even
    * key-like. High containment into a unique parent column is the
    * signature of an undeclared foreign key; low containment flags a
    * spurious structural guess — the report a catalog monitor publishes
    * when the warehouse declares no constraints (the reference's
    * catalogs expose none: `svv_table_info`/`show columns` carry no FK
    * metadata).
    *
    * Output per candidate: `(child_table, fk, parent_table, pk,
    * n_child_keys, n_contained, containment_bp, n_parent_rows,
    * n_parent_keys, parent_unique)`.
    *
    * Scale design: each side reduces to its key relation before
    * anything joins (the q110 shape) — the parent's to (key, row-count)
    * groups, so its row total AND key count ride the SAME relation
    * (refIntegrity's `__ccnt` move) — and ONE full-outer join between
    * the two key relations feeds a single stat aggregate. Genuinely one
    * scan per side per candidate: no separate parent stat lineage.
    * (A table repeated across candidates still re-scans per pair —
    * parquet scans are cheap relative to caching corpus-scale keys;
    * callers auditing many candidates against one parent can cache it.)
    */
  def fkDiscovery(
      candidates: Seq[(DataFrame, String, String, DataFrame, String, String)])
      : DataFrame = {
    require(candidates.nonEmpty, "empty candidate list")
    candidates.map { case (child, childName, fkCol, parent, parentName, pkCol) =>
      val childKeys = child.where(col(fkCol).isNotNull)
        .select(col(fkCol).as("__k")).distinct()
        .withColumn("__c", lit(1))
      // (key, per-key row count) — the null-key group keeps the total
      // row count exact while never equi-matching a (non-null) child key
      val parentKeys = parent.select(col(pkCol).as("__pk"))
        .groupBy("__pk").agg(count(lit(1)).cast("long").as("__pc"))
      childKeys.join(parentKeys, col("__k") === col("__pk"), "full_outer")
        .agg(
          coalesce(sum(when(col("__c").isNotNull, 1L)), lit(0L))
            .cast("long").as("__ckeys"),
          coalesce(sum(when(col("__c").isNotNull && col("__pk").isNotNull,
            1L)), lit(0L)).cast("long").as("__hit"),
          coalesce(sum(col("__pc")), lit(0L)).cast("long").as("__prows"),
          coalesce(sum(when(col("__pk").isNotNull, 1L)), lit(0L))
            .cast("long").as("__pkeys"))
        .select(
          lit(childName).as("child_table"), lit(fkCol).as("fk"),
          lit(parentName).as("parent_table"), lit(pkCol).as("pk"),
          col("__ckeys").as("n_child_keys"),
          col("__hit").as("n_contained"),
          when(col("__ckeys") > 0,
            round(col("__hit") * lit(10000.0) / col("__ckeys"), 4))
            .as("containment_bp"),
          col("__prows").as("n_parent_rows"),
          col("__pkeys").as("n_parent_keys"),
          (col("__pkeys") === col("__prows")).as("parent_unique"))
    }.reduce(_.unionByName(_))
      .orderBy("child_table", "fk", "parent_table", "pk")
  }

  /** Audit several FK pairs into one report (one row each). */
  def refIntegritySuite(
      pairs: Seq[(DataFrame, String, String, DataFrame, String, String)])
      : DataFrame = {
    require(pairs.nonEmpty, "empty audit suite")
    pairs.map { case (c, cn, fk, p, pn, pk) =>
      refIntegrity(c, cn, fk, p, pn, pk)
    }.reduce(_.unionByName(_))
      .orderBy("child_table", "fk")
  }

  /** Inferred range contract + validation in one pass — [[check]]'s
    * rules are hand-written; this INFERS the per-key value envelope
    * from a trusted reference snapshot (min/max per key) and audits a
    * new snapshot against it: the "did any key produce values outside
    * everything we've ever seen" release gate.
    *
    * One stat aggregate over the reference (K bound rows, broadcast),
    * one conditional-count aggregate over the current snapshot — each
    * side scanned once. Bound comparisons run on the RAW doubles (both
    * engines hold the identical values; the reported lo/hi quantize to
    * micro only for the hash). Keys unseen in the reference surface
    * with NULL bounds and `known_key` false — a new key IS a contract
    * event, not a silent drop.
    *
    * Output: (key, known_key, lo_micro, hi_micro, n_cur, n_below,
    * n_above, viol_ppm, flagged), key-ordered; flagged = any
    * out-of-envelope row or an unknown key.
    */
  def rangeContractReport(ref: DataFrame, cur: DataFrame,
      keyCol: String, valCol: String): DataFrame = {
    val contract = ref
      .groupBy(col(keyCol).as("k"))
      .agg(min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
    cur.select(col(keyCol).as("k"), col(valCol).as("v"))
      .join(broadcast(contract), Seq("k"), "left")
      .groupBy(col("k"), col("lo").isNotNull.as("known_key"),
        round(col("lo") * 1e6).cast("long").as("lo_micro"),
        round(col("hi") * 1e6).cast("long").as("hi_micro"))
      .agg(count(lit(1)).as("n_cur"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_above"))
      .select(col("k").as(keyCol), col("known_key"),
        col("lo_micro"), col("hi_micro"), col("n_cur"),
        col("n_below"), col("n_above"),
        expr("((n_below + n_above) * 1000000L) div n_cur").as("viol_ppm"),
        (!col("known_key") ||
          col("n_below") + col("n_above") > 0).as("flagged"))
      .orderBy(keyCol)
  }

  /** Streaming twin of [[rangeContractReport]] (the psiFromCounts
    * pattern — the release gate most natural to run continuously):
    * `counts` is the drained/emitted output of
    * [[graft.streaming.StreamingOps.keyedValueCensusStream]] —
    * (window_start, window_end, k, vm, c_cur) micro-quantized census
    * rows — audited per window against the envelope inferred from the
    * trusted `ref` snapshot. Comparisons run in the MICRO domain on
    * both sides (bounds round to micro first); values with ≤6 decimal
    * digits quantize exactly, so the verdict matches the batch
    * operator's raw-double comparison there (Round7gSpec pins drained
    * ≡ batch on the q200 fixture split). Like the batch report, an
    * unknown key flags with NULL bounds and a ref key absent from the
    * window emits nothing.
    *
    * Output: the batch columns behind leading (window_start,
    * window_end), (window, key)-ordered.
    */
  def rangeContractFromCounts(counts: DataFrame, ref: DataFrame,
      keyCol: String, valCol: String): DataFrame = {
    val contract = ref.groupBy(col(keyCol).as("k"))
      .agg(round(min(col(valCol)) * 1e6).cast("long").as("lo_micro"),
        round(max(col(valCol)) * 1e6).cast("long").as("hi_micro"))
    counts
      .join(broadcast(contract), Seq("k"), "left")
      .groupBy(col("window_start"), col("window_end"), col("k"),
        col("lo_micro").isNotNull.as("known_key"),
        col("lo_micro"), col("hi_micro"))
      .agg(sum("c_cur").as("n_cur"),
        sum(when(col("vm") < col("lo_micro"), col("c_cur"))
          .otherwise(0L)).as("n_below"),
        sum(when(col("vm") > col("hi_micro"), col("c_cur"))
          .otherwise(0L)).as("n_above"))
      .select(col("window_start"), col("window_end"),
        col("k").as(keyCol), col("known_key"),
        col("lo_micro"), col("hi_micro"), col("n_cur"),
        col("n_below"), col("n_above"),
        expr("((n_below + n_above) * 1000000L) div n_cur").as("viol_ppm"),
        (!col("known_key") ||
          col("n_below") + col("n_above") > 0).as("flagged"))
      .orderBy("window_start", keyCol)
  }
}
