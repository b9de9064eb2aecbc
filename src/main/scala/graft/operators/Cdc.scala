package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a changelog of keyed upserts and
  * deletes onto a base snapshot, latest-wins — the batch MERGE a corpus
  * pipeline runs when a delivery arrives as (key, seq, op, payload)
  * events rather than full rows (takedowns, re-crawls, metadata
  * corrections). The SCD2 sibling `TimeSeries.changeIntervals` keeps
  * history; this produces the CURRENT snapshot.
  *
  * Semantics: for each key, only the change with the highest `seqCol`
  * counts. If it is a delete, the key disappears (whether or not it was
  * in the base); if an upsert, its payload replaces/creates the row;
  * keys never mentioned pass through untouched. `seqCol` must totally
  * order changes within a key (a unique log offset / commit LSN — ties
  * would make "latest" ambiguous, so the operator requires uniqueness
  * rather than inventing a tiebreak).
  *
  * Shape: ONE shuffle of the changelog by key (the latest-wins window),
  * then ONE key-equi FULL OUTER join against the base — each input
  * scanned exactly once (an anti-join + union formulation would consume
  * the latest-change relation twice and recompute its whole lineage;
  * the single join folds keep/replace/insert/delete into one pass,
  * plan-gated at two leaves). At 100 TB the base is the big side: it
  * shuffles once on the key — or not at all if the snapshot is bucketed
  * by key, the layout this operator's own output preserves — and the
  * changelog side is the delivery, not the corpus.
  */
object Cdc {

  /** Apply `changes` (keyCol + seqCol + opCol + every non-key base
    * column) onto `base`; returns the new snapshot with `base`'s schema.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, deleteOp: String = "D"): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base payload column: ${payload.mkString(",")}")
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol) +: col(opCol).as("__op") +:
        payload.map(p => col(p).as(s"__c_$p")): _*)
    base
      .join(latest, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(col(keyCol) +: payload.map(p =>
        when(col("__op").isNotNull, col(s"__c_$p")).otherwise(col(p))
          .as(p)): _*)
  }
}
