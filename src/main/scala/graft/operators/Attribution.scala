package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution over an event stream: every conversion
  * (purchase) splits its value EQUALLY across the user's touches
  * (clicks) inside the preceding attribution window — the linear model,
  * the standard complement to the first/last-touch answers the as-of
  * join family gives (q62/q95 attribute a click to one purchase; this
  * attributes a purchase's value back onto many clicks).
  *
  * Numerics: purchase values go to MICRO-integers before the split and
  * each touch's share is the truncated integer quotient `value_micro /
  * n_touches` (exact, association-free), so the per-click credit sum is
  * an integer aggregate — deterministic cross-engine. Remainder
  * micro-units (< n_touches per purchase) are deliberately dropped, not
  * redistributed; the oracle applies the same rule.
  *
  * Scale shape: the touch↔conversion pairing is [[RangeJoin
  * .binnedRangeJoin]] (per-user equi-join on time bins — never a
  * cross product); the per-purchase touch count is a window over the
  * JOIN OUTPUT keyed by purchase (bounded by pairs-in-window, not
  * corpus), and the final rollup is click-keyed.
  */
object Attribution {

  /** Per-click linear credit: `(event_id, n_purchases, credit_micro)`
    * for every click that participates in ≥1 attribution window.
    */
  def linearCredits(events: DataFrame, windowSeconds: Long,
      clickType: String = "click", purchaseType: String = "purchase")
      : DataFrame = {
    require(windowSeconds >= 1, "window must be >= 1s")
    val p = events.filter(col("event_type") === purchaseType)
      .select(col("user_id"), col("event_id").as("p_event"),
        round(col("value") * 1000000.0).cast("long").as("vm"),
        (unix_timestamp(col("ts")) - windowSeconds).as("lo"),
        unix_timestamp(col("ts")).as("hi"))
    val c = events.filter(col("event_type") === clickType)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("v"))
    val paired = RangeJoin.binnedRangeJoin(c, p, Seq("user_id"),
      "v", "lo", "hi", windowSeconds)
    paired
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("p_event")))
      // integer quotient (`div`, not `/` — Column./ on longs is a double
      // divide); each (click, purchase) pair is unique (the point's
      // single bin), so plain counts are pair counts
      .withColumn("__credit", expr("vm div __n"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum("__credit").cast("long").as("credit_micro"))
      .orderBy("event_id")
  }
}
