package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive: given two
  * versions of a corpus, classify every document as `added`, `removed`,
  * `changed`, or `unchanged`. A training-data pipeline runs this between
  * crawl refreshes to audit churn before re-deduplicating / re-training
  * (the reference's monitors track table-level row-count/schema drift —
  * `/root/reference/AWS_Redshift/redshift_table_monitor.py:39-45`'s
  * record-count metrics; this is the same idea at document granularity,
  * per-row content identity instead of table totals).
  *
  * Scale shape: each side reduces to (id, source, md5(text)) BEFORE the
  * join — one 16-byte content key per doc, never the text — then ONE
  * full-outer shuffle join on the high-cardinality doc id. Cost is two
  * scans + one join of slim relations, independent of document length.
  */
object Diff {

  /** (doc_id, source, status) for every doc present in either version;
    * `source` comes from the NEW version for added/changed/unchanged
    * docs and from the old version for removed ones.
    */
  def corpusDiff(oldV: DataFrame, newV: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", carryCol: String = "source"): DataFrame = {
    def keyed(df: DataFrame) = graft.util.Parallelism.ensure(df)
      .select(col(idCol).as("doc_id"), col(carryCol).as("carry"),
        md5(col(textCol)).as("ck"))
    val o = keyed(oldV).withColumnsRenamed(Map("carry" -> "o_carry", "ck" -> "o_ck"))
    val n = keyed(newV).withColumnsRenamed(Map("carry" -> "n_carry", "ck" -> "n_ck"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("n_carry"), col("o_carry")).as(carryCol),
        when(col("o_ck").isNull, lit("added"))
          .when(col("n_ck").isNull, lit("removed"))
          .when(col("o_ck") =!= col("n_ck"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Per-(source, status) rollup of [[corpusDiff]] — the churn report. */
  def diffReport(oldV: DataFrame, newV: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", carryCol: String = "source"): DataFrame =
    corpusDiff(oldV, newV, idCol, textCol, carryCol)
      .groupBy(carryCol, "status")
      .agg(count(lit(1)).as("n_docs"))
}
