package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-key skew diagnostics: the heavy-hitter census a pipeline runs
  * BEFORE picking a join strategy — the measurement side of the salting
  * ([[graft.util.SkewJoin]]) and hot-bucket-cap ([[Dedup]]) remedies this
  * engine already ships. "Which keys would serialize a shuffle join, and
  * how much of the table do they own?"
  *
  * The reference monitors table-level shape only
  * (`/root/reference/Snowflake/snowflake_database_monitor.py:24-31`,
  * row/byte counts per table); per-KEY concentration is the missing
  * input for every skew decision at 100 TB.
  *
  * Scale shape: ONE hash aggregate over the key (map-side partials), then
  * top-N heavy keys via TakeOrdered — the corpus-sized count relation is
  * never globally sorted. The grand total rides the same count relation
  * as a broadcast stat row; rank/cumulative-share window runs over the N
  * selected stat rows only.
  *
  * Determinism: share basis points are computed from exact integer
  * counts; the (count DESC, key ASC) cut and rank are a total order.
  */
object SkewReport {

  /** Top-N heavy keys of `keyCol`: `(rank, key, cnt, share_bp, cum_bp)`
    * where share_bp = round(cnt·10000/total, 4) and cum_bp its running
    * sum over the ranked N rows (both from integer counts).
    */
  /** Exact join-cardinality forecast — the guard a pipeline runs BEFORE
    * a 100 TB equi-join: from the two sides' per-key censuses,
    * `|L ⋈ R| = Σ_k cL(k)·cR(k)` exactly, plus the top-N exploding keys
    * by per-key output (the rows a salting/broadcast/cap decision needs).
    * [[keySkew]] reads one relation's concentration; this reads the
    * PRODUCT the join would materialize.
    *
    * Scale shape: one hash aggregate per side (map-side partials), a
    * stat-grain join on DISTINCT keys (censuses, never data rows), and a
    * TakeOrdered top-N — no data-side join runs at all. Counts and
    * products are exact BIGINTs (envelope: a single key with >3e9 rows
    * per side overflows the product; at that point the join itself is
    * the bug this report exists to catch).
    *
    * Output: the '__all' row (total matched left rows, matched right
    * rows, exact join output rows) then top-N keys by (out_rows DESC,
    * key ASC): (key, n_left, n_right, out_rows).
    */
  def joinSizeReport(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, topN: Int = 10): DataFrame = {
    val cl = left.groupBy(col(leftKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_left"))
    val cr = right.groupBy(col(rightKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_right"))
    val j = cl.join(cr, Seq("key"))
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("out_rows"))
    val total = j.agg(sum("n_left").as("n_left"),
        sum("n_right").as("n_right"), sum("out_rows").as("out_rows"))
      .select(lit("__all").as("key"), col("n_left"), col("n_right"),
        col("out_rows"))
    total.unionByName(
        j.orderBy(col("out_rows").desc, col("key")).limit(topN))
      .orderBy(col("key") =!= "__all", col("out_rows").desc, col("key"))
  }

  /** Streaming twin of [[joinSizeReport]] (the psiFromCounts pattern):
    * `counts` is the drained/emitted output of
    * [[graft.streaming.StreamingOps.keyCensusStream]] — per-window
    * (key, n_left) census rows — forecast per window against the
    * static `right` side's key census. The continuous form of the
    * pre-join guard: the day's incoming keys are sized against the
    * dimension BEFORE the daily join runs. Same output contract as
    * the batch report ('__all' + top-N by product), per window; the
    * per-window top-N runs over the matched-key stat rows.
    */
  def joinSizeFromCounts(counts: DataFrame, right: DataFrame,
      rightKey: String, topN: Int = 10): DataFrame = {
    val cr = right.groupBy(col(rightKey).cast("string").as("key"))
      .agg(count(lit(1)).as("n_right"))
    val j = counts.join(broadcast(cr), Seq("key"))
      .select(col("window_start"), col("window_end"), col("key"),
        col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("out_rows"))
    val total = j.groupBy("window_start", "window_end")
      .agg(sum("n_left").as("n_left"), sum("n_right").as("n_right"),
        sum("out_rows").as("out_rows"))
      .select(col("window_start"), col("window_end"),
        lit("__all").as("key"), col("n_left"), col("n_right"),
        col("out_rows"))
    val w = Window.partitionBy("window_start", "window_end")
      .orderBy(col("out_rows").desc, col("key"))
    val top = j.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topN).drop("__rk")
    total.unionByName(top)
      .orderBy(col("window_start"), col("key") =!= "__all",
        col("out_rows").desc, col("key"))
  }

  def keySkew(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val top = counts
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
    val w = Window.orderBy(col("cnt").desc, col("key").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("share_bp", round(col("cnt") * 10000.0 / col("total"), 4))
      .withColumn("cum_bp",
        round(sum(col("cnt")).over(w) * 10000.0 / col("total"), 4))
      .select("rank", "key", "cnt", "share_bp", "cum_bp")
      .orderBy("rank")
  }
}
