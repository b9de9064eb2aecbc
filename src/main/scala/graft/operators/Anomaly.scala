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
  *
  * Scale convention: each report is ONE scan of the data. The table
  * reduces to its (group, value) HISTOGRAM (or daily stat rows) in a
  * single map-side-combinable aggregate, and the medians arrive as
  * WINDOW columns over that stat relation — no join back to the data,
  * no second scan, no aggregate-of-aggregate lineage recompute (which
  * Spark would otherwise re-scan once per reuse; exchange reuse does
  * not bridge differently-shaped consumers).
  */
object Anomaly {

  /** Append exact doubled-median column `out` per group to a HISTOGRAM
    * `(groupCol, vCol, cntCol)` — vCol must be distinct within a group
    * (a histogram key). Same scale shape as the q11/q96 percentile
    * machinery ([[Winsorize.exactBounds]]): the only sort sees distinct
    * VALUES, not rows. The doubled median of n values is
    * `v@⌊(n−1)/2⌋ + v@⌊n/2⌋` (0-based), an exact BIGINT; a distinct
    * value of count c covers 0-based positions [cum−c, cum−1], so the
    * pick is a conditional-min window — two extra Window nodes over the
    * SAME partitioning, no new shuffle.
    */
  private[operators] def withMed2(h: DataFrame, groupCol: String,
      vCol: String, cntCol: String, out: String): DataFrame = {
    val byVal = Window.partitionBy(groupCol).orderBy(vCol)
    val byGrp = Window.partitionBy(groupCol)
    def pick(pos: Column) = min(when(
      pos >= col("__cum") - col(cntCol) && pos < col("__cum"),
      col(vCol))).over(byGrp)
    h.withColumn("__cum", sum(col(cntCol)).over(byVal))
      .withColumn("__n", sum(col(cntCol)).over(byGrp))
      .withColumn(out,
        (pick(expr("(__n - 1) div 2")) + pick(expr("__n div 2")))
          .cast("long"))
      .drop("__cum", "__n")
  }

  /** Row-level sibling of [[withMed2]] for relations that are ALREADY
    * tiny stat rows (one row per day): values may repeat, so positions
    * come from a ROW frame under a deterministic (value, tiebreak)
    * total order — any tiebreak picks the same two VALUES.
    */
  private[operators] def withMed2Rows(df: DataFrame, groupCol: Column,
      vCol: String, tieCol: String, out: String): DataFrame = {
    val byVal = Window.partitionBy(groupCol).orderBy(col(vCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byGrp = Window.partitionBy(groupCol)
    def pick(pos: Column) = min(when(pos === col("__cum") - 1, col(vCol)))
      .over(byGrp)
    df.withColumn("__cum", count(lit(1)).over(byVal))
      .withColumn("__n", count(lit(1)).over(byGrp))
      .withColumn(out,
        (pick(expr("(__n - 1) div 2")) + pick(expr("__n div 2")))
          .cast("long"))
      .drop("__cum", "__n")
  }

  /** Daily row-volume anomaly report: `(day, n_events, median_events,
    * mad_events, robust_z, is_anomaly)` — one row per observed day,
    * flagged when the robust z `|n − med| / (1.4826·MAD)` exceeds `k`.
    * A zero MAD (all days identical) degrades to flagging any deviation.
    *
    * Scale: ONE scan — the event log reduces to one stat row per day in
    * a single map-side-combinable aggregate; median and MAD arrive as
    * window columns over those ≤365 rows (single-partition windows over
    * a bounded stat domain, the q98/q99 convention). Nothing after the
    * first aggregate ever sees data rows, and nothing re-scans them.
    */
  def dailyVolumeAnomaly(df: DataFrame, tsCol: String = "ts",
      k: Double = 2.0): DataFrame = {
    val daily = df
      .groupBy(to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).cast("long").as("n_events"))
    val withMed = withMed2Rows(daily, lit(1), "n_events", "__day", "med2")
      .withColumn("__dev2", abs(lit(2L) * col("n_events") - col("med2")))
    val withMad = withMed2Rows(withMed, lit(1), "__dev2", "__day", "mad4")
    withMad
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
    * Scale: ONE scan — digit extraction at scan stage, a 9-group
    * aggregate, and the grand total as a window over the 9 joined stat
    * rows (a second `obs.agg(...)` lineage would re-scan the table).
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
    val expected = BenfordExpectedBp.toDF("digit", "exp_bp")
    expected
      .join(broadcast(obs), Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("__t", sum("n").over(Window.partitionBy(lit(1))))
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
    * Scale: ONE scan — the table reduces to its (group, value)
    * histogram once; the value median arrives as a window column, the
    * deviation domain re-aggregates to its own (group, dev2) histogram
    * (deviations collide by symmetry, and the position-pick needs
    * distinct keys), the MAD arrives as a second window column, and the
    * census is one aggregate over histogram rows weighted by their
    * counts. No joins anywhere — z depends only on (dev2, med2, mad4),
    * all carried on the stat rows.
    */
  /** Seasonality-adjusted volume anomalies — [[dailyVolumeAnomaly]]
    * flags against a flat baseline, which mislabels every weekend in
    * weekday-seasonal traffic; here each (key, day) compares against
    * its key's WEEKDAY-OF-WEEK mean, so only departures from the
    * key's own weekly rhythm flag. Integer end-to-end: daily counts,
    * floor-divided weekday means, and a permille band
    * `|residual|·1000 > mean·thresholdPermille`.
    *
    * Stat-grain throughout: the (key, day) census is calendar-bounded;
    * the weekday profile is a (key, dow) re-aggregate of it joined
    * back by (key, dow). Day-of-week convention: Sunday = 0 (Spark's
    * `dayofweek` − 1 ≡ SQL `dayofweek`).
    *
    * Output per (key, day): (key, day, dow, volume, dow_mean_floor,
    * residual, flagged), (key, day)-ordered.
    */
  def seasonalResidualReport(events: DataFrame, keyCol: String,
      tsCol: String = "ts", thresholdPermille: Long = 500L): DataFrame = {
    val daily = graft.util.Caches.cached(events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day").agg(count(lit(1)).as("volume"))
      .withColumn("dow", (dayofweek(col("day")) - 1).cast("int")))
    val profile = daily.groupBy("key", "dow")
      .agg(expr("sum(volume) div count(1)").as("dow_mean_floor"))
    daily.join(profile, Seq("key", "dow"))
      .select(col("key").as(keyCol), col("day"), col("dow"),
        col("volume"), col("dow_mean_floor"),
        (col("volume") - col("dow_mean_floor")).as("residual"),
        (abs(col("volume") - col("dow_mean_floor")) * 1000 >
          col("dow_mean_floor") * thresholdPermille).as("flagged"))
      .orderBy(keyCol, "day")
  }

  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 2.0): DataFrame = {
    val hist = df
      .select(col(groupCol), col(valCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(groupCol, "__v").agg(count(lit(1)).as("__cnt"))
    val withMed = withMed2(hist, groupCol, "__v", "__cnt", "med2")
      .withColumn("__dev2", abs(lit(2L) * col("__v") - col("med2")))
    val devHist = withMed
      .groupBy(col(groupCol), col("med2"), col("__dev2"))
      .agg(sum("__cnt").as("__cnt"))
    val withMad = withMed2(devHist, groupCol, "__dev2", "__cnt", "mad4")
    val scored = withMad
      .withColumn("__z", when(col("mad4") > 0,
        round(lit(2.0) * col("__dev2") / (lit(1.4826) * col("mad4")), 6)))
      .withColumn("__out", when(col("mad4") > 0, col("__z") > k)
        .otherwise(col("__dev2") > 0))
    scored.groupBy(groupCol)
      .agg(
        sum("__cnt").cast("long").as("n_rows"),
        round(first("med2") / 2.0, 1).as("median"),
        round(first("mad4") / 4.0, 2).as("mad"),
        sum(when(col("__out"), col("__cnt")).otherwise(0L)).cast("long")
          .as("n_outliers"),
        max(col("__z")).as("max_robust_z"))
      .withColumn("outlier_bp",
        round(col("n_outliers") * lit(10000.0) / col("n_rows"), 4))
      .select(col(groupCol), col("n_rows"), col("median"), col("mad"),
        col("n_outliers"), col("outlier_bp"), col("max_robust_z"))
      .orderBy(groupCol)
  }
}
