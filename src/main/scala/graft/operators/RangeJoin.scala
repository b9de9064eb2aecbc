package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: points ⋈ intervals on `lo <= v < hi` (plus optional
  * equi-keys) — the interval-containment primitive (event in window,
  * value in band, IP in CIDR range) that Spark plans as a broadcast
  * nested-loop or cartesian product when written as a raw inequality
  * join.
  *
  * The bin trick makes it an EQUI-join: choose a bin width w; each
  * interval registers under every bin it overlaps
  * (floor(lo/w)..floor(hi/w) — an explode of (hi-lo)/w + 1 rows), each
  * point under exactly the one bin floor(v/w). The equi-join on
  * (keys, bin) then meets every qualifying (point, interval) pair in
  * exactly ONE bin — the point's — so no post-join dedup is needed; a
  * residual `lo <= v && v < hi` filter removes same-bin near-misses.
  *
  * Scale: shuffle keys are (keys, bin) — hash-partitionable, AQE-skew-
  * splittable, sort-merge-joinable; cost scales with interval fan-out
  * (pick w ≈ median interval width so fan-out is O(1) per interval),
  * not |points|×|intervals|. This is the standard bin/bucket range-join
  * optimization that warehouse engines apply automatically.
  */
object RangeJoin {

  /** @param points    relation carrying `valCol` (numeric)
    * @param intervals relation carrying `loCol`/`hiCol` (numeric,
    *                  lo inclusive, hi exclusive; rows with hi <= lo
    *                  match nothing)
    * @param keyCols   equi-key columns present on both sides (may be empty)
    * @param binWidth  bin width in value units — pick ≈ the median
    *                  interval width
    * @return          all (point, interval) joined rows: point columns +
    *                  interval columns, one row per qualifying pair
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], valCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    val p = points.withColumn("__bin", floor(col(valCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(loCol) <= col(valCol) && col(valCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: L ⋈ R on `[lLo, lHi) ∩ [rLo, rHi) ≠ ∅` (plus
    * optional equi-keys) — the interval×interval sibling of
    * [[binnedRangeJoin]]'s point-in-interval form (session × outage
    * window, shipment × promotion period, genomic-interval overlap).
    *
    * Same bin trick, one extra subtlety: an overlapping pair may share
    * MANY bins, so the equi-join alone would emit duplicates. Instead of
    * a post-join distinct (a second corpus-sized shuffle), each pair is
    * kept only in its canonical meeting bin `max(floor(lLo/w),
    * floor(rLo/w))` — the bin containing the later start. For any
    * overlapping pair the later start lies inside BOTH intervals, so both
    * sides register under that bin and the pair survives exactly once;
    * non-overlapping same-bin pairs die in the residual filter. Output is
    * therefore duplicate-free with NO dedup operator.
    *
    * Scale: shuffle keys are (keys, bin); per-interval fan-out is
    * `width/w + 1` rows (pick w ≈ median interval width). No nested-loop
    * join, no distinct. Empty intervals (hi <= lo) match nothing.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) > col(lo))
      .withColumn("__bin",
        explode(sequence(floor(col(lo) / binWidth),
          floor((col(hi) - 1) / binWidth))))
    val l = binned(left, lLo, lHi)
    val r = binned(right, rLo, rHi)
    l.join(r, keyCols :+ "__bin")
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__bin") === floor(greatest(col(lLo), col(rLo)) / binWidth))
      .drop("__bin")
  }

  /** Adaptive-width variant: derives the bin width as the median interval
    * width (`approx_percentile` over hi - lo — one tiny agg returning a
    * scalar, never data rows), so per-interval fan-out is O(1) without
    * the caller knowing the value distribution. Join OUTPUT is identical
    * for any width (the bin is an internal blocking key; the residual
    * filter decides membership) — only the intermediate size varies.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], valCol: String, loCol: String,
      hiCol: String): DataFrame = {
    val row = intervals
      .agg(percentile_approx((col(hiCol) - col(loCol)).cast("double"),
        lit(0.5), lit(10000)))
      .head()
    val med = if (row.isNullAt(0)) 1.0 else row.getDouble(0)
    binnedRangeJoin(points, intervals, keyCols, valCol, loCol, hiCol,
      math.max(1L, med.toLong))
  }
}
