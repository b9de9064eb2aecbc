package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap: per-group mean with a resampling
  * confidence interval, in ONE scan and ZERO randomness at run time.
  *
  * The classic bootstrap resamples n rows with replacement B times —
  * undistributable as stated (global sampling per replicate). The
  * Poisson bootstrap replaces each replicate's multinomial with
  * independent per-row Poisson(1) weights, which factor across
  * partitions; here the weights are furthermore DETERMINISTIC — replicate
  * b's weight for a row is the row id hashed through the house Knuth
  * hash ([[Sampling.idHash]] of id·B + b) and bucketed by the Poisson(1)
  * CDF over the hash range (frozen integer thresholds, capped at 5).
  * Both engines replay the identical integer arithmetic, so a
  * resampling CI becomes hash-exact — no seeds, no RNG state, and
  * re-running on the same data gives the same interval.
  *
  * Shape: the B replicates ride as 2B extra integer AGGREGATE COLUMNS
  * (Σwᵢyᵢ and Σwᵢ per replicate) on the one group-by — map-side partial
  * aggregation reduces each partition to one row of 2B+2 longs; no
  * explode, no per-replicate pass. Replicate means are micro-floor
  * integers; the interval is the 2nd / (B−1)-th order statistic of the
  * alive replicate means (≈92% coverage at B = 24).
  */
object Bootstrap {

  /** Poisson(1) CDF at 0..4, scaled to [[Sampling.HashMod]] and floored;
    * hash < t(w) ⇒ weight ≤ w. Tail mass beyond 4 (~0.37%) caps at 5.
    */
  val PoissonThresholds: Seq[Long] =
    Seq(367879443L, 735758887L, 919698609L, 981011849L, 996340160L)

  /** Replicate b's integer weight for row `id` (0 ≤ b < nReplicates). */
  def replicateWeight(id: Column, b: Int, nReplicates: Int): Column = {
    val h = Sampling.idHash(id * lit(nReplicates.toLong) + lit(b.toLong))
    PoissonThresholds.zipWithIndex.foldRight(lit(5L): Column) {
      case ((t, w), acc) => when(h < t, w.toLong).otherwise(acc)
    }
  }

  /** (group, n_rows, sum_micro, mean_micro_floor, ci_lo_micro,
    * ci_hi_micro, n_dead) per group — CI bounds NULL when fewer than 3
    * replicates drew any mass (only conceivable for near-empty groups).
    */
  def meanCi(df: DataFrame, groupCol: String, valCol: String,
      idCol: String, nReplicates: Int = 24): DataFrame = {
    require(nReplicates >= 3, "need at least 3 replicates for an interval")
    val vm = round(col(valCol).cast("double") * 1e6).cast("long")
    val reps = 0 until nReplicates
    val aggs =
      (count(lit(1)).as("n_rows") +: sum(vm).as("sy") +:
        reps.flatMap { b =>
          val w = replicateWeight(col(idCol), b, nReplicates)
          Seq(sum(w * vm).as(s"swy_$b"), sum(w).as(s"sw_$b"))
        })
    val means = array(reps.map(b =>
      when(col(s"sw_$b") > 0, expr(s"swy_$b div sw_$b"))): _*)
    df.groupBy(col(groupCol).as("g"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("ms", sort_array(filter(means, _.isNotNull)))
      .select(col("g").as(groupCol), col("n_rows"),
        col("sy").as("sum_micro"),
        expr("sy div n_rows").as("mean_micro_floor"),
        when(size(col("ms")) >= 3, element_at(col("ms"), 2))
          .as("ci_lo_micro"),
        when(size(col("ms")) >= 3,
          element_at(col("ms"), size(col("ms")) - 1)).as("ci_hi_micro"),
        (lit(nReplicates) - size(col("ms"))).as("n_dead"))
      .orderBy(groupCol)
  }
}
