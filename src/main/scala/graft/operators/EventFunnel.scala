package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence funnel: of the users who did step 1, how many
  * went on to do step 2 AFTER it, step 3 after that, ... — the
  * journey-analysis complement of [[Pipeline.filterFunnel]] (which counts
  * rows through static predicates, not users through a temporal order).
  *
  * Semantics: a user reaches step k iff events of types s₁…s_k exist at
  * strictly increasing timestamps. Matching is greedy-earliest — step k's
  * anchor is the MINIMUM timestamp of an s_k event after step k−1's
  * anchor — which is complete for the existence question: if any valid
  * increasing assignment exists, the earliest-anchor chain is one of
  * them (each greedy anchor is ≤ the corresponding anchor of any valid
  * chain, by induction).
  *
  * Scale shape: ONE type-pruned scan, ONE shuffle + sort on `user_id`
  * (the high-cardinality key). The greedy anchors t₁…t_K stack as K
  * conditional-min WINDOW columns over the same user partition — step
  * k's condition references t_{k−1} from the previous Window node, so
  * no join, no per-step re-aggregation, and no second pass over the
  * event log (the earlier join-chain formulation re-ran the scan once
  * per step AND once per count; exchange reuse did not collapse the
  * differently-shaped stages). The per-user relation then collapses to
  * one row per user (reusing the user partitioning — no new exchange)
  * and to a single stat row of step counts, which unfolds into the
  * S-row report driver-free.
  */
object EventFunnel {

  /** One row per step: (step_idx, step, users, conv_bp) where conv_bp is
    * the basis-point share of step-1 users still present at this step.
    */
  def sequenceFunnel(events: DataFrame, steps: Seq[String],
      tsCol: String = "ts", userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val byUser = Window.partitionBy("u")
    val typed = events
      .filter(col(typeCol).isin(steps.map(s => s: Any): _*))
      .select(col(userCol).as("u"), col(tsCol).as("__ts"),
        col(typeCol).as("__s"))
    // t_k = min ts of an s_k event strictly after t_{k-1} (NULL-safe:
    // __ts > NULL is NULL, so a broken chain stays NULL downstream)
    val anchored = steps.zipWithIndex.foldLeft(typed) {
      case (df, (step, i)) =>
        val cond = if (i == 0) col("__s") === step
          else col("__s") === step && col("__ts") > col(s"__t${i - 1}")
        df.withColumn(s"__t$i", min(when(cond, col("__ts"))).over(byUser))
    }
    // every row of a user carries identical anchors; reduce to one row
    // per user on the SAME partitioning, then to one stat row of counts
    val anchorAggs = steps.indices.map(i => max(col(s"__t$i")).as(s"__t$i"))
    val perUser = anchored.groupBy("u")
      .agg(anchorAggs.head, anchorAggs.tail: _*)
    val countAggs = steps.indices.map(i =>
      count(col(s"__t$i")).cast("long").as(s"__c$i"))
    val stat = perUser.agg(countAggs.head, countAggs.tail: _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"__c$i").as("users"))
    }
    stat.select(col("__c0").as("__u0"), explode(array(rows: _*)).as("__r"))
      .select(col("__r.step_idx").as("step_idx"), col("__r.step").as("step"),
        col("__r.users").as("users"),
        // NULL share on an empty funnel head (mirrors the oracle's CASE)
        when(col("__u0") > 0,
          round(col("__r.users") * 10000.0 / col("__u0"), 4)).as("conv_bp"))
      .orderBy("step_idx")
  }

  /** Time-to-convert distribution by start cohort day: for users whose
    * first `fromPred` event lands on day D, how long until their first
    * `toPred` event at-or-after it — conversion share plus exact
    * latency quartiles, the "how fast does the funnel actually flow"
    * companion of [[sequenceFunnel]]'s how-many counts.
    *
    * Latencies are exact µs (`unix_micros` deltas — any cross-engine
    * epoch offset cancels in the subtraction). Shape: ONE type-pruned
    * scan cached, first-A per user and first-B-after-A reuse the SAME
    * user-keyed shuffle (high-cardinality key), then everything is
    * cohort-day stat grain: a (day, dt) census with the house
    * conditional-min order-statistic picks — the per-day window runs
    * over census stat rows, never a single global partition (cohort
    * day is the partition key precisely so the quartile windows scale).
    *
    * Output per cohort day: (day, n_started, n_converted, conv_ppm,
    * mean_us, p25_us, p50_us, p75_us, p90_us), day-ordered; quartiles
    * NULL on days with zero conversions.
    */
  def conversionLatency(events: DataFrame, fromPred: Column,
      toPred: Column, tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame = {
    val typed = graft.util.Caches.cached(events
      .filter(fromPred || toPred)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("t"),
        fromPred.as("isA"), toPred.as("isB")))
    val firstA = typed.filter(col("isA"))
      .groupBy("u").agg(min("t").as("ta"))
    val convs = typed.filter(col("isB"))
      .join(firstA, Seq("u"))
      .filter(col("t") >= col("ta"))
      .groupBy("u", "ta").agg(min("t").as("tb"))
    val day = to_date(timestamp_micros(col("ta"))).as("day")
    val started = firstA.groupBy(day).agg(count(lit(1)).as("n_started"))
    val census = convs
      .select(day, (col("tb") - col("ta")).as("dt"))
      .groupBy("day", "dt").agg(count(lit(1)).as("c"))
    val wd = Window.partitionBy("day")
    val wCum = wd.orderBy("dt").rowsBetween(Window.unboundedPreceding, 0)
    def pick(rankExpr: String, name: String) =
      min(when(col("cum") >= expr(rankExpr), col("dt"))).as(name)
    val quart = census
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wd))
      .withColumn("s", sum(col("dt") * col("c")).over(wd))
      .groupBy("day", "n", "s")
      .agg(
        pick("(n + 3) div 4", "p25_us"),
        pick("(n + 1) div 2", "p50_us"),
        pick("(3 * n + 3) div 4", "p75_us"),
        pick("(9 * n + 9) div 10", "p90_us"))
    started.join(quart, Seq("day"), "left")
      .na.fill(0L, Seq("n"))
      .select(col("day"), col("n_started"),
        col("n").as("n_converted"),
        expr("(n * 1000000L) div n_started").as("conv_ppm"),
        when(col("n") > 0, expr("s div n")).as("mean_us"),
        col("p25_us"), col("p50_us"), col("p75_us"), col("p90_us"))
      .orderBy("day")
  }
}
