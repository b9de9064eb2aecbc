package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk audits over training-data tables.
  *
  * Before an event log or user table ships into a training corpus, the
  * standard re-identification questions are k-anonymity (does any
  * quasi-identifier combination isolate fewer than k records?) and the
  * identity-diversity of each class (does a class map to a SINGLE
  * subject? — the l-diversity=1 failure, where "anonymized" rows
  * deterministically reveal who acted).
  *
  * The audit is one groupBy over the quasi-identifier columns — a single
  * scan, aggregation fully partial (map-side combine), output bounded by
  * the QI-domain cardinality, never row count. No windows, no joins.
  */
object Privacy {

  /** Per-equivalence-class k-anonymity census: for every observed
    * quasi-identifier combination, the row count, the number of distinct
    * subjects (`idCol`), and the two violation flags —
    * `k_violation` (class has < k rows: the classic k-anonymity breach)
    * and `single_id` (all rows in the class belong to one subject: any
    * attacker who can form the QI key learns WHO).
    *
    * Callers roll this up further at will (violation counts, % rows at
    * risk); the class-level relation is the audit artifact reviewers
    * need — which slices leak, not just how many.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      idCol: String, k: Long): DataFrame = {
    val cls = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_ids"))
    cls
      .withColumn("k_violation", col("n_rows") < k)
      .withColumn("single_id", col("n_ids") === 1L)
      .orderBy(quasiCols.map(col): _*)
  }

  /** Per-class l-diversity census — k-anonymity's complement for the
    * SENSITIVE attribute: a class can hold plenty of rows (k-safe) while
    * every row shares one sensitive value, so forming the QI key still
    * reveals the secret (the homogeneity attack). Distinct-l diversity
    * asks every class to carry ≥ l distinct sensitive values.
    *
    * Shape: the (quasi, sensitive) census first — ONE scan, partial
    * aggregation — then a stat-grain re-aggregation per class for the
    * row count, distinct-value count, and the modal value's frequency
    * (`max_freq`, the homogeneity measure: max_freq = n_rows ⇔ the
    * class is pure). No corpus-row distinct, no windows.
    *
    * Output per class: (quasi..., n_rows, n_sensitive, max_freq,
    * l_violation, homogeneous).
    */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    val census = df
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__c"))
    census
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__c").as("n_rows"),
        count(lit(1)).as("n_sensitive"),
        max("__c").as("max_freq"))
      .withColumn("l_violation", col("n_sensitive") < l)
      .withColumn("homogeneous", col("n_sensitive") === 1L)
      .orderBy(quasiCols.map(col): _*)
  }
}
