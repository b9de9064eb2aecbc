package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to each left row the most recent right
  * row at-or-before its timestamp, per key — the event-attribution /
  * feature-lookup primitive (last price before a trade, last purchase
  * before a click, latest config before a run) that Spark has no native
  * operator for.
  *
  * Scale shape — the point of this formulation: a naive range join
  * (`l.ts >= r.ts` + per-left max) explodes to |L|·|R| rows per key
  * before pruning; the pandas merge_asof path is single-node. Here both
  * sides UNION into one relation, shuffle ONCE on the key, sort ONCE on
  * (key, ts, side), and a running `last(right_payload, ignoreNulls)`
  * window carries the latest right payload forward into each left row.
  * Cost is one Exchange + one Sort over |L|+|R| rows — the same plan
  * shape as sessionization (q44), independent of how many right rows
  * precede each left row. Both window frames share the single sort, and
  * per-key partitions balance as long as keys do (salt upstream for a
  * corpus-sized hot key).
  *
  * Determinism: right rows must be unique per (key, ts) — pre-aggregate
  * ties away (e.g. `max_by` the payload on a tiebreak id) or the carried
  * payload depends on sort stability. The conformance query (q62) does
  * exactly that, matching DuckDB's ASOF JOIN pick.
  */
object AsOfJoin {

  /** @param left        left (probe) relation
    * @param right       right (reference) relation, unique per (key, ts)
    * @param keyCols     equi-key columns present on both sides
    * @param leftTs      left timestamp column
    * @param rightTs     right timestamp column
    * @param payloadCols right columns to attach to each left row
    * @param joinType    "inner" drops left rows with no preceding right
    *                    row; "left" keeps them with null payload
    * @param inclusive   true: right row at ts == left ts matches (ASOF
    *                    `>=`); false: strictly-before (ASOF `>`)
    * @param maxGapSeconds tolerance: a preceding right row older than
    *                    this many seconds does not match (merge_asof's
    *                    `tolerance`). The carried match is still the
    *                    LATEST preceding row — tolerance only invalidates
    *                    it, it never reaches further back — so this is a
    *                    pure post-window predicate: same single
    *                    shuffle+sort plan, zero extra exchanges.
    */
  def asofLast(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      joinType: String = "inner", inclusive: Boolean = true,
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"joinType: $joinType")
    val leftCols = left.columns.toSeq
    // side tag orders the union so a right row at the same timestamp
    // sorts before the left row iff it should be visible to it
    val (rightTag, leftTag) = if (inclusive) (0, 1) else (2, 1)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(rightTag).as("__side"),
        struct((payloadCols.map(col) :+
          col(rightTs).as("__rts")): _*).as("__r")): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(leftTag).as("__side"),
        lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == leftTs).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftTag)
    // tolerance: invalidate (never re-search — the carried row IS the
    // nearest) a match older than the gap. timestamp→long = epoch seconds
    // (floored), matching DuckDB date_diff('second', ...) whole-second
    // boundary counting.
    val matched = maxGapSeconds match {
      case Some(gap) => carried.withColumn("__match",
        when(col("__ts").cast("long") - col("__match.__rts").cast("long")
          <= gap, col("__match")))
      case None => carried
    }
    // unmatched test on the struct itself, not a payload field (a matched
    // row may carry a legitimately-null payload value)
    val filtered =
      if (joinType == "inner") matched.filter(col("__match").isNotNull)
      else matched
    filtered.select(
      leftCols.map(c => if (c == leftTs) col("__ts").as(leftTs) else col(c)) ++
        payloadCols.map(p => col(s"__match.$p").as(p)): _*)
  }
}
