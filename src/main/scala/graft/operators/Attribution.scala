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

  /** EXACT SHAPLEY-VALUE attribution (public method: Shapley 1953;
    * Zhao et al. 2018's "Shapley value methods for attribution
    * modeling"): each key's journey (events before its first
    * `convState`, the [[Transitions.removalEffect]] truncation)
    * reduces to its SET of touched channels; the coalition value
    * v(S) is the observed conversion rate (micro) of keys whose
    * touched set is EXACTLY S (unobserved coalitions value 0 — the
    * documented convention, mirrored in SQL); channel c's credit is
    * the order-averaged marginal Σ_{S∌c} |S|!·(K−1−|S|)!·(v(S∪c) −
    * v(S)) div K!.
    *
    * Exactness: channel sets are BITMASKS (channel index = the
    * alphabetical rank), coalition stats are exact integers, the
    * factorial weights are exact longs (K is the CHANNEL vocabulary,
    * ≤ ~20 — 2^K coalition stat rows and K·2^(K−1) marginal rows,
    * never data-grain), and the single floor division happens after
    * the integer sum. One driver round-trip reads K (a 1-value stat,
    * the house K-row allowance) because `spark.range(2^K)` needs the
    * bound at plan time.
    *
    * Output per channel: (channel, n_keys_touched, n_conv_touched,
    * shapley_micro), channel-ordered. Σ shapley = v(full) − v(∅)
    * (efficiency, spec-pinned).
    */
  def shapleyAttribution(events: DataFrame, convState: String,
      keyCol: String = "user_id", stateCol: String = "event_type",
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val spark = events.sparkSession
    val ev = events.select(col(keyCol).as("u"), col(stateCol).as("s"),
      col(tsCol).as("ts"), col(tieCol).as("tie"))
    val byU = Window.partitionBy("u")
      .orderBy(col("ts").asc, col("tie").asc)
    val conv = ev.filter(col("s") === convState)
      .withColumn("rn", row_number().over(byU))
      .filter(col("rn") === 1)
      .select(col("u"), col("ts").as("cts"), col("tie").as("ctie"))
    val touched = graft.util.Caches.cached(ev
      .join(conv, Seq("u"), "left")
      .filter(col("cts").isNull || col("ts") < col("cts") ||
        (col("ts") === col("cts") && col("tie") < col("ctie")))
      .select(col("u"), col("s"),
        col("cts").isNotNull.as("conv")).distinct())
    val chIdx = graft.util.Caches.cached(touched.select("s").distinct()
      .withColumn("idx",
        row_number().over(Window.orderBy("s")) - 1))
    val k = chIdx.count().toInt
    require(k >= 1 && k <= 20, s"channel vocabulary $k out of [1, 20]")
    // per-key bitmask + conversion flag; keys with an empty journey
    // (first event converts) land at mask 0 via the conv relation
    val masks = touched
      .join(chIdx, Seq("s"))
      .groupBy("u", "conv")
      .agg(sum(expr("shiftleft(1L, idx)")).as("mask"))
      .unionByName(conv.join(touched.select("u").distinct(),
          Seq("u"), "left_anti")
        .select(col("u"), lit(true).as("conv"), lit(0L).as("mask")))
    val coal = masks.groupBy("mask")
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("conv"), 1L).otherwise(0L)).as("n_conv"))
      .withColumn("v", expr("(n_conv * 1000000) div n_keys"))
    val subsets = spark.range(1L << k).select(col("id").as("ss"))
    val pairs = subsets.crossJoin(broadcast(chIdx))
      .filter(expr("(ss & shiftleft(1L, idx)) = 0"))
      .withColumn("sc", expr("ss + shiftleft(1L, idx)"))
      .withColumn("sz", expr("bit_count(ss)"))
      .withColumn("w", expr(
        s"cast(factorial(sz) * factorial(${k - 1} - sz) as long)"))
    val withV = pairs
      .join(broadcast(coal.select(col("mask").as("ss"),
        col("v").as("v_s"))), Seq("ss"), "left")
      .join(broadcast(coal.select(col("mask").as("sc"),
        col("v").as("v_sc"))), Seq("sc"), "left")
      .select(col("s").as("channel"), col("w"),
        (coalesce(col("v_sc"), lit(0L)) -
          coalesce(col("v_s"), lit(0L))).as("dv"))
    val perCh = withV.groupBy("channel")
      // DECIMAL: w·dv reaches 19!·10⁶ ≈ 10²³ at the K cap — past long
      .agg(expr("cast(sum(cast(w as decimal(38,0)) * dv) div " +
        s"cast(factorial($k) as decimal(38,0)) as long)")
        .as("shapley_micro"))
    val stats = touched.join(chIdx, Seq("s"))
      .groupBy(col("s").as("channel"))
      .agg(count(lit(1)).as("n_keys_touched"),
        sum(when(col("conv"), 1L).otherwise(0L)).as("n_conv_touched"))
    stats.join(perCh, Seq("channel"))
      .select("channel", "n_keys_touched", "n_conv_touched",
        "shapley_micro")
      .orderBy("channel")
  }
}
