package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data-layout keys: interleave the bits of several
  * quantized columns so rows close in EVERY dimension land close in ONE
  * sort order — the multi-column locality trick behind Delta/Iceberg's
  * `OPTIMIZE ZORDER BY`. Files written in z-key order carry tight
  * min/max ranges on ALL z-ordered columns simultaneously, so zone-map
  * data skipping prunes scans for predicates on any of them; a plain
  * lexicographic sort only ever serves its leading column.
  *
  * Everything is integer arithmetic on a broadcast min/max stat row —
  * quantization is `(v − min) · (2ᵇ − 1) / range` in integer division,
  * the interleave is a closed-form shift/mask fold — so z-keys are
  * deterministic and the oracle mirrors them bit-for-bit.
  */
object Layout {

  /** Interleave `bits`-wide quantized dims (dim i's bit b lands at
    * position `b · n + i`). Pure Column fold — codegen-friendly, no UDF.
    */
  private def interleave(dims: Seq[Column], bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      dims.zipWithIndex.foldLeft(acc) { case (a, (d, i)) =>
        a.bitwiseOR(
          shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), b * dims.size + i))
      }
    }

  /** Append a `zkey` column interleaving `cols` at `bits` bits each
    * (`bits · cols.size ≤ 62`). Min/max per column come from ONE stat
    * aggregate broadcast back; constant columns quantize to 0.
    */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    require(bits * cols.size <= 62, "z-key must fit a signed long")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__min_$c"),
      max(col(c)).cast("long").as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val maxQ = (1L << bits) - 1
    val joined = df.crossJoin(broadcast(stats))
    val dims = cols.map { c =>
      val lo = col(s"__min_$c")
      val range = greatest(col(s"__max_$c") - lo, lit(1L))
      (col(c).cast("long") - lo) * maxQ / range
    }
    joined
      .withColumn("zkey", interleave(dims, bits))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Locality census: bucket rows by the TOP `bucketBits` of the z-key
    * and report, per bucket, the count and each dimension's min/max —
    * the zone-map a file written per bucket would carry. Tight
    * per-bucket ranges on every column = the z-order win, spec-asserted
    * against the global ranges.
    */
  def zOrderReport(df: DataFrame, cols: Seq[String], bits: Int = 8,
      bucketBits: Int = 4): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= bits * cols.size)
    val keyed = withZKey(df, cols, bits)
    val shift = bits * cols.size - bucketBits
    val aggCols = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        min(col(c)).cast("long").as(s"min_$c"),
        max(col(c)).cast("long").as(s"max_$c")))
    keyed
      .withColumn("bucket", shiftright(col("zkey"), shift))
      .groupBy("bucket")
      .agg(aggCols.head, aggCols.tail: _*)
      .orderBy("bucket")
  }

  /** Zone-map effectiveness of the table's CURRENT physical layout —
    * "would min/max pruning on this column actually skip partitions":
    * per column, every partition's (min, max) range off one
    * `spark_partition_id()` aggregate, then the fraction of the K²/2
    * partition pairs whose ranges overlap (inclusive endpoints). A
    * column the data is ordered by overlaps ~0 (every predicate
    * prunes); a randomly-scattered column overlaps ~100% (zone maps
    * are useless — the signal to sort/Z-order before writing). The
    * inspection-side complement of [[withZKey]]/[[zOrderReport]].
    *
    * The pair count comes from an ENDPOINT SWEEP, not a pair join: 2K
    * events (min → open, max → close, opens before closes at equal
    * position so touching ranges count as overlapping), one running
    * sum, and Σ over open-events of (ranges already open) — O(K log K)
    * where the naive pa<pb self-join is O(K²). A 100 TB table has 10⁵+
    * partitions; 10¹⁰ pairs in the advisor whose whole point is big
    * tables would be self-defeating, while 2·10⁵ event rows through a
    * single stat-grain window are free (Round8aSpec pins sweep ≡ pair
    * join on both fixture layouts). Partitions whose bounds are NULL
    * (all-null column chunk) join the pair DENOMINATOR but never the
    * overlap count — the same contract the pair join's null-condition
    * `otherwise(0)` gave.
    *
    * Partition-dependent by construction (it MEASURES the layout), so
    * spec-only — no cross-engine oracle exists.
    *
    * Output per column: (col_name, n_parts, n_pairs, n_overlapping,
    * overlap_ppm), column-ordered.
    */
  def clusteringReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns")
    import org.apache.spark.sql.expressions.Window
    val aggCols = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        min(col(c)).cast("long").as(s"mn_$c"),
        max(col(c)).cast("long").as(s"mx_$c")))
    val parts = graft.util.Caches.cached(df
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg(aggCols.head, aggCols.tail: _*))
    val perCol = cols.map { c =>
      val ev = parts.filter(col(s"mn_$c").isNotNull)
        .select(col(s"mn_$c").as("pos"), lit(0).as("typ"),
          lit(1L).as("d"))
        .unionByName(parts.filter(col(s"mn_$c").isNotNull)
          .select(col(s"mx_$c").as("pos"), lit(1).as("typ"),
            lit(-1L).as("d")))
      // single-partition window: 2K STAT rows, bounded by the
      // partition count, never the data
      val w = Window.orderBy("pos", "typ")
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.withColumn("cum", sum("d").over(w))
        .filter(col("typ") === 0)
        .agg(coalesce(sum(col("cum") - 1), lit(0L)).as("ov"))
        .crossJoin(broadcast(parts.agg(count(lit(1)).as("n_parts"))))
        .select(lit(c).as("col_name"), col("n_parts"),
          expr("(n_parts * (n_parts - 1)) div 2").as("n_pairs"),
          when(col("n_parts") > 1, col("ov")).as("n_overlapping"),
          when(col("n_parts") > 1,
            expr("(ov * 1000000L) div ((n_parts * (n_parts - 1)) div 2)"))
            .as("overlap_ppm"))
    }
    perCol.reduce(_ unionByName _).orderBy("col_name")
  }
}
