package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for text corpora.
  *
  * Regex-rule scrubbing in the C4/CCNet tradition: find emails, IPv4
  * addresses, phone-shaped and long digit runs; count them per document
  * and replace them with typed placeholder tokens before training.
  *
  * The patterns use only syntax with identical semantics in java.util
  * .regex (Spark codegen'd `regexp_*`) and RE2 (the DuckDB oracle):
  * character classes, bounded repetition, alternation — no backrefs, no
  * lookaround. Everything is a per-row projection over the scan stage
  * (pure `regexp_extract_all`/`regexp_replace` columns, no UDF, no
  * shuffle until the report aggregate), so the scrub runs at full scan
  * bandwidth at any corpus size.
  */
object Scrub {

  /** (type, pattern, replacement) — order matters: emails first so their
    * digit parts aren't half-eaten by the digit-run rule.
    */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", "[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}", "<PHONE>"),
    ("digits", "[0-9]{6,}", "<NUM>"))

  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Apply all redaction rules in order. */
  def scrub(text: Column): Column =
    Rules.foldLeft(text) { case (t, (_, pat, repl)) =>
      regexp_replace(t, lit(pat), lit(repl))
    }

  /** Per-doc PII profile: one count column per rule + scrubbed length
    * delta (0 for clean docs).
    *
    * Metric semantics (by design, consistent on both engines):
    *  - `chars_delta` = raw length − scrubbed length. It can be NEGATIVE
    *    when a placeholder is longer than its match (a 6-char email →
    *    `<EMAIL>`), hence "delta", not "removed".
    *  - per-rule `n_*` counts are computed independently on the RAW text,
    *    while [[scrub]] applies rules sequentially — nested matches (a
    *    digit run inside an email) count under every rule that matches
    *    them, so the counts can overlap and their sum can exceed what one
    *    sequential pass actually redacts.
    */
  def docStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val countCols = Rules.map { case (name, pat, _) =>
      matchCount(t, pat).cast("long").as(s"n_$name")
    }
    graft.util.Parallelism.ensure(docs).select(
      col(idCol).as("doc_id") +: countCols :+
        (length(t) - length(scrub(t))).cast("long").as("chars_delta"): _*)
  }

  /** Per-group scrub report: docs, per-rule totals, clean-doc count. */
  def report(docs: DataFrame, groupCol: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val stats = docStats(docs, idCol, textCol)
    val totalCols = Rules.map { case (name, _, _) =>
      sum(s"n_$name").cast("long").as(s"total_$name")
    }
    val anyPii = Rules.map(r => col(s"n_${r._1}")).reduce(_ + _)
    stats.join(docs.select(col(idCol).as("doc_id"), col(groupCol)), "doc_id")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        totalCols.head +: totalCols.tail :+
          sum(when(anyPii === 0, 1L).otherwise(0L)).cast("long").as("clean_docs") :+
          sum("chars_delta").cast("long").as("chars_delta"): _*)
      .orderBy(groupCol)
  }
}
