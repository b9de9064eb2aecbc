package graft.operators

import org.apache.spark.sql.DataFrame
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
}
