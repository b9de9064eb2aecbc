package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED variance-reduced experiment readout (Controlled-experiment
  * Using Pre-Experiment Data, Deng et al. 2013 — the industry-standard
  * A/B variance-reduction): each user's experiment-period metric y is
  * adjusted by their OWN pre-period metric x,
  * `y_adj = y − θ·(x − x̄)` with `θ = cov(x, y)/var(x)` fitted on the
  * pooled population, shrinking between-user variance without biasing
  * the treatment contrast (the adjustment is mean-zero by
  * construction).
  *
  * Exact cores: per-user milli-integer period sums in ONE conditional
  * aggregate (one scan, user-keyed — no per-period re-scan); the
  * pooled (n, Σx, Σy, Σxy, Σx²) stat row accumulates products in
  * DECIMAL(38,0) (the oracle's HUGEINT matches exactly); θ, the means
  * and the adjusted means derive from those integers with the
  * identical expression in SQL. Per-arm aggregation is stat grain; the
  * pooled row broadcasts. θ degrades to 0 on a constant covariate
  * (var(x) = 0 → no adjustment) rather than NULLing the readout.
  *
  * Output per arm: (arm, n_users, sum_y_milli, sum_x_milli,
  * mean_y_milli, adj_mean_y_milli, theta), arm-ordered.
  */
object Experiment {

  def cupedReport(events: DataFrame, prePred: Column, armExpr: Column,
      valCol: String = "value", userCol: String = "user_id"): DataFrame = {
    val dec = "decimal(38,0)"
    val vm = round(col(valCol).cast("double") * 1e3).cast("long")
    val perUser = events
      .groupBy(col(userCol).as("u"))
      .agg(sum(when(prePred, vm).otherwise(0L)).as("x"),
        sum(when(!prePred, vm).otherwise(0L)).as("y"))
    val pooled = perUser.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
    val varX = col("n").cast(dec) * col("sxx") -
      col("sx").cast(dec) * col("sx").cast(dec)
    val theta = pooled.select(col("n"), col("sx"),
      when(varX > 0,
        (col("n").cast(dec) * col("sxy") -
          col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
          varX.cast("double"))
        .otherwise(lit(0.0)).as("theta"))
    val arms = perUser
      .groupBy(armExpr.as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum("y").as("sum_y_milli"), sum("x").as("sum_x_milli"))
    val meanY = col("sum_y_milli").cast("double") / col("n_users")
    val meanX = col("sum_x_milli").cast("double") / col("n_users")
    val meanXAll = col("sx").cast("double") / col("n")
    arms.crossJoin(broadcast(theta))
      .select(col("arm"), col("n_users"), col("sum_y_milli"),
        col("sum_x_milli"),
        round(meanY, 6).as("mean_y_milli"),
        round(meanY - col("theta") * (meanX - meanXAll), 6)
          .as("adj_mean_y_milli"),
        round(col("theta"), 6).as("theta"))
      .orderBy("arm")
  }
}
