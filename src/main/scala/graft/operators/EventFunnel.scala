package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale shape: step k is one type-pruned scan aggregated per user
  * (map-side partial min), equi-joined on `user_id` — the
  * high-cardinality key — against the previous step's (user, anchor)
  * relation. No window function; nothing ever sorts the event log. The
  * chained per-step relations share identical aggregate/exchange
  * subtrees, which Spark's ReuseExchange collapses at runtime, so the
  * union of per-step counts does not multiply full scans. The final
  * share arithmetic runs on S stat rows (S = step count).
  */
object EventFunnel {

  /** One row per step: (step_idx, step, users, conv_bp) where conv_bp is
    * the basis-point share of step-1 users still present at this step.
    */
  def sequenceFunnel(events: DataFrame, steps: Seq[String],
      tsCol: String = "ts", userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    // (user, anchor-ts) per step, built left to right
    val reaches = steps.zipWithIndex
      .scanLeft(Option.empty[DataFrame]) { case (prev, (step, _)) =>
        val typed = events.filter(col(typeCol) === step)
          .select(col(userCol).as("u"), col(tsCol).as("ts"))
        Some(prev match {
          case None =>
            typed.groupBy("u").agg(min("ts").as("t"))
          case Some(p) =>
            typed.join(p.select(col("u"), col("t").as("t_prev")), Seq("u"))
              .filter(col("ts") > col("t_prev"))
              .groupBy("u").agg(min("ts").as("t"))
        })
      }
      .flatten
    val counts = reaches.zip(steps).zipWithIndex.map {
      case ((reach, step), i) =>
        reach.agg(count(lit(1)).cast("long").as("users"))
          .select(lit(i + 1).as("step_idx"), lit(step).as("step"),
            col("users"))
    }
    val all = counts.reduce(_ unionByName _)
    val first = all.filter(col("step_idx") === 1)
      .select(col("users").as("u0"))
    all.crossJoin(broadcast(first))
      .select(col("step_idx"), col("step"), col("users"),
        // NULL share on an empty funnel head (mirrors the oracle's CASE)
        when(col("u0") > 0,
          round(col("users") * 10000.0 / col("u0"), 4)).as("conv_bp"))
      .orderBy("step_idx")
  }
}
