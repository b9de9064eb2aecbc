package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-key skew diagnostics: the heavy-hitter census a pipeline runs
  * BEFORE picking a join strategy — the measurement side of the salting
  * ([[graft.util.SkewJoin]]) and hot-bucket-cap ([[Dedup]]) remedies this
  * engine already ships. "Which keys would serialize a shuffle join, and
  * how much of the table do they own?"
  *
  * The reference monitors table-level shape only
  * (`/root/reference/Snowflake/snowflake_database_monitor.py:24-31`,
  * row/byte counts per table); per-KEY concentration is the missing
  * input for every skew decision at 100 TB.
  *
  * Scale shape: ONE hash aggregate over the key (map-side partials), then
  * top-N heavy keys via TakeOrdered — the corpus-sized count relation is
  * never globally sorted. The grand total rides the same count relation
  * as a broadcast stat row; rank/cumulative-share window runs over the N
  * selected stat rows only.
  *
  * Determinism: share basis points are computed from exact integer
  * counts; the (count DESC, key ASC) cut and rank are a total order.
  */
object SkewReport {

  /** Top-N heavy keys of `keyCol`: `(rank, key, cnt, share_bp, cum_bp)`
    * where share_bp = round(cnt·10000/total, 4) and cum_bp its running
    * sum over the ranked N rows (both from integer counts).
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val top = counts
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
    val w = Window.orderBy(col("cnt").desc, col("key").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("share_bp", round(col("cnt") * 10000.0 / col("total"), 4))
      .withColumn("cum_bp",
        round(sum(col("cnt")).over(w) * 10000.0 / col("total"), 4))
      .select("rank", "key", "cnt", "share_bp", "cum_bp")
      .orderBy("rank")
  }
}
