package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration of a non-negative measure per group — the scalar
  * inequality summary behind "is this corpus dominated by a few huge
  * documents / is this source's token mass concentrated?" audits
  * (SkewReport names the top keys; Gini grades the WHOLE distribution,
  * comparable across groups of different size).
  *
  * Definition (population Gini over sorted values x₍₁₎≤…≤x₍ₙ₎):
  * G = Σᵢ(2i−n−1)·x₍ᵢ₎ / (n·Σx). Computed in the VALUE DOMAIN: the
  * per-(group, value) histogram collapses ties, and a tied run of count
  * c starting after cumulative count `cum` contributes exactly
  * v·c·(2·cum + c − n) to the numerator (Σ(2i−n−1) telescoped over the
  * run) — so the rank window runs over DISTINCT values per group, not
  * corpus rows, and tie order can't perturb the sum (it's invariant by
  * construction). ONE scan, one histogram aggregate, windows over stat
  * rows only.
  *
  * Integer core: `gini_num` accumulates in DECIMAL(38,0) (v·c·n headroom
  * exceeds a long once n·v passes ~10¹⁸) and lands as an exact BIGINT;
  * `gini` divides by n·Σx in double at 6 dp.
  */
object Concentration {

  /** (group, n_rows, sum_val, gini_num, gini) per group, group-ordered. */
  def giniReport(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val h = df
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy("g")
    val wOrd = wg.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = col("v").cast(dec) * col("c").cast(dec) *
      (lit(2).cast(dec) * col("cum").cast(dec) + col("c") - col("n"))
    h
      .withColumn("cum", coalesce(sum("c").over(wOrd), lit(0L)))
      .withColumn("n", sum("c").over(wg))
      .withColumn("total", sum(col("v") * col("c")).over(wg))
      .groupBy("g")
      .agg(
        max("n").as("n_rows"),
        max("total").as("sum_val"),
        sum(contrib).cast("long").as("gini_num"))
      .withColumn("gini",
        when(col("sum_val") > 0, round(
          col("gini_num").cast("double") /
            (col("n_rows").cast("double") * col("sum_val")), 6)))
      .select(col("g").as(groupCol), col("n_rows"), col("sum_val"),
        col("gini_num"), col("gini"))
      .orderBy(groupCol)
  }
}
