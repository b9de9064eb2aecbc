package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust anomaly detection for data observability — the alerting layer
  * the reference's monitors feed (each template logs per-run metrics;
  * deciding "is today's number WRONG?" is the half the reference leaves
  * to the platform). Median/MAD is the standard robust choice: one bad
  * day cannot drag the baseline the way it drags a mean/stddev.
  *
  * Determinism convention (the q87/q98 one): every median is computed
  * as an exact INTEGER `2×median` (`med2`) from the grouped value
  * histogram, deviations stay in the doubled-integer domain
  * (`dev2 = |2v − med2|`), and the MAD arrives as integer `4×MAD`
  * (`mad4 = 2×median(dev2)`). The only double arithmetic is the final
  * robust z `2·dev2 / (1.4826·mad4)`, rounded to 6 dp before any
  * comparison — so flags are cross-engine exact.
  */
object Anomaly {

  /** Exact 2×median of an integer column per group: `(groupCol, med2)`.
    *
    * Same scale shape as the q11/q96 percentile machinery
    * ([[Winsorize.exactBounds]]): aggregate to the (group, value)
    * HISTOGRAM first — fully parallel — then a per-group running count
    * over the DISTINCT values only. The doubled median of n values is
    * `v@⌊(n−1)/2⌋ + v@⌊n/2⌋` (0-based), an exact BIGINT.
    */
  private[operators] def medianX2(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val grouped = df
      .select(col(groupCol), col(valCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(groupCol, "__v").agg(count(lit(1)).as("__cnt"))
    val byVal = Window.partitionBy(groupCol).orderBy("__v")
    val byGrp = Window.partitionBy(groupCol)
    val cum = grouped.select(col(groupCol), col("__v"), col("__cnt"),
      sum("__cnt").over(byVal).as("__cum"),
      sum("__cnt").over(byGrp).as("__n"))
    // a distinct value covers 0-based positions [cum-cnt, cum-1];
    // integer `div` keeps positions exact at any n
    def pick(pos: Column) = min(when(
      pos >= col("__cum") - col("__cnt") && pos < col("__cum"),
      col("__v")))
    val lo = expr("(__n - 1) div 2")
    val hi = expr("__n div 2")
    cum.groupBy(groupCol)
      .agg((pick(lo) + pick(hi)).cast("long").as("med2"))
  }

  /** Daily row-volume anomaly report: `(day, n_events, median_events,
    * mad_events, robust_z, is_anomaly)` — one row per observed day,
    * flagged when the robust z `|n − med| / (1.4826·MAD)` exceeds `k`.
    * A zero MAD (all days identical) degrades to flagging any deviation.
    *
    * Scale: the event log reduces to one stat row per day in a single
    * map-side-combinable aggregate; the medians, joins and flags all
    * live in the ≤365-row stat domain. Nothing after the first
    * aggregate ever sees data rows.
    */
  def dailyVolumeAnomaly(df: DataFrame, tsCol: String = "ts",
      k: Double = 2.0): DataFrame = {
    val daily = df
      .groupBy(to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).cast("long").as("n_events"))
    val med = medianX2(daily.withColumn("__g", lit(1)), "__g", "n_events")
      .select(col("med2"))
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("__dev2", abs(lit(2L) * col("n_events") - col("med2")))
    val mad = medianX2(dev.withColumn("__g", lit(1)), "__g", "__dev2")
      .select(col("med2").as("mad4"))
    dev.crossJoin(broadcast(mad))
      .withColumn("robust_z", when(col("mad4") > 0,
        round(lit(2.0) * col("__dev2") / (lit(1.4826) * col("mad4")), 6)))
      .select(
        col("__day").cast("string").as("day"),
        col("n_events"),
        round(col("med2") / 2.0, 1).as("median_events"),
        round(col("mad4") / 4.0, 2).as("mad_events"),
        col("robust_z"),
        when(col("mad4") > 0, col("robust_z") > k)
          .otherwise(col("__dev2") > 0).as("is_anomaly"))
      .orderBy("day")
  }

  /** Expected Benford first-digit shares in basis points, as pinned
    * 4-dp literals (embedded identically in the oracle SQL, so no
    * cross-engine `log10` enters the compare).
    */
  val BenfordExpectedBp: Seq[(Int, Double)] = (1 to 9).map { d =>
    d -> BigDecimal(math.log10(1.0 + 1.0 / d) * 10000.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Benford first-significant-digit test over a positive monetary
    * column: `(digit, n, obs_bp, exp_bp, dev_bp)` — 9 rows. The value
    * quantizes to integer cents and the digit comes from the INTEGER's
    * decimal string, so no float-format or log10 edge case can differ
    * between engines. Fabricated/synthetic amounts show up as a heavy
    * deviation from the logarithmic curve.
    *
    * Scale: scan-stage digit extraction + a 9-group aggregate; the
    * grand total broadcasts back as one stat row.
    */
  def benfordReport(df: DataFrame, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df
      .select(round(col(valCol).cast("double") * 100).cast("long").as("__i"))
      .where(col("__i") > 0)
      .select(substring(col("__i").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).cast("long").as("n"))
    val total = obs.agg(sum("n").as("__t"))
    val expected = BenfordExpectedBp.toDF("digit", "exp_bp")
    expected
      .join(broadcast(obs), Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .select(
        col("digit"), col("n"),
        when(col("__t") > 0, round(col("n") * lit(10000.0) / col("__t"), 4))
          .as("obs_bp"),
        col("exp_bp"))
      .withColumn("dev_bp", round(col("obs_bp") - col("exp_bp"), 4))
      .orderBy("digit")
  }

  /** Per-group robust outlier census over an integer column:
    * `(group, n_rows, median, mad, n_outliers, outlier_bp,
    * max_robust_z)` — a row is an outlier when its robust z exceeds
    * `k`; a zero-MAD group (over half the mass on one value) degrades
    * to flagging any deviation from the median.
    *
    * Scale: two grouped-histogram median passes (values, then
    * deviations — both deduplicate before the only window), each
    * re-entering as a BROADCAST stat relation; the scoring pass is
    * scan-stage arithmetic and the report is one aggregate per group.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 2.0): DataFrame = {
    val med = medianX2(df, groupCol, valCol)
    val dev = df
      .select(col(groupCol), col(valCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__dev2", abs(lit(2L) * col("__v") - col("med2")))
    val mad = medianX2(dev, groupCol, "__dev2")
      .withColumnRenamed("med2", "mad4")
    val scored = dev.join(broadcast(mad), Seq(groupCol))
      .withColumn("__z", when(col("mad4") > 0,
        round(lit(2.0) * col("__dev2") / (lit(1.4826) * col("mad4")), 6)))
      .withColumn("__out", when(col("mad4") > 0, col("__z") > k)
        .otherwise(col("__dev2") > 0))
    scored.groupBy(groupCol)
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        round(first("med2") / 2.0, 1).as("median"),
        round(first("mad4") / 4.0, 2).as("mad"),
        sum(when(col("__out"), 1L).otherwise(0L)).cast("long")
          .as("n_outliers"),
        max(col("__z")).as("max_robust_z"))
      .withColumn("outlier_bp",
        round(col("n_outliers") * lit(10000.0) / col("n_rows"), 4))
      .select(col(groupCol), col("n_rows"), col("median"), col("mad"),
        col("n_outliers"), col("outlier_bp"), col("max_robust_z"))
      .orderBy(groupCol)
  }
}
