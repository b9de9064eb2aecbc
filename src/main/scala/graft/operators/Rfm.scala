package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) segmentation — the classic
  * behavioral scoring every event log grows into: per user, days since
  * last activity, activity count, and value sum, each mapped to a
  * 1–5 quintile score.
  *
  * The quintile assignment deliberately avoids `ntile` over users —
  * that is a corpus-scale window in ONE partition (users aren't a
  * grouping key here). Instead each metric's 4 quintile BOUNDARIES come
  * from its value-domain histogram (boundary q = min v with cumulative
  * count ≥ ⌈q·n/5⌉ — the exact order-statistic convention), broadcast
  * as one stat row; scores are then scan-stage comparisons. Ties share
  * a score (they must — equal values are indistinguishable), which is
  * also what makes the assignment deterministic cross-engine.
  *
  * Scores ascend with "better": f_q/m_q are 1 + #boundaries strictly
  * below the value; r_q INVERTS (5 = most recent) per RFM convention.
  *
  * ONE corpus scan into the cached user-grain metric relation;
  * histograms and boundary rows are user-domain stat work.
  */
object Rfm {

  def rfmReport(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val horizon = events.agg(max(to_date(col(tsCol))).as("h"))
    val users = graft.util.Caches.cached(events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("u")
      .agg(max("day").as("last_day"), count(lit(1)).as("frequency"),
        sum("vm").as("monetary_micro"))
      .crossJoin(broadcast(horizon))
      .withColumn("recency_days",
        datediff(col("h"), col("last_day")).cast("long"))
      .drop("h", "last_day"))

    // the metric histograms are ENTITY-DERIVED (distinct per-user
    // frequency/monetary totals grow with the population), so the
    // cumulative counts come from the PrefixSum two-level scan and the
    // total from a broadcast 1-row aggregate — no unpartitioned window
    def boundaries(metric: String): DataFrame = {
      val hist = graft.util.Caches.cached(
        users.groupBy(col(metric).as("v")).agg(count(lit(1)).as("c")))
      val tot = hist.agg(coalesce(sum("c"), lit(0L)).as("n"))
      val cum = PrefixSum
        .cumBefore(hist, "v", "c", "__cb", s"rfm.boundaries($metric)")
        .withColumn("cum", col("__cb") + col("c"))
        .crossJoin(broadcast(tot))
      val aggs = (1 to 4).map(q =>
        min(when(col("cum") >= expr(s"($q * n + 4) div 5"), col("v")))
          .as(s"__b$q"))
      cum.agg(aggs.head, aggs.tail: _*)
    }

    def score(metric: String, b: String): Column =
      (1 to 4).map(q =>
        when(col(metric) > col(s"${b}_b$q"), 1L).otherwise(0L))
        .reduce(_ + _) + 1

    def renamed(df: DataFrame, p: String) =
      (1 to 4).foldLeft(df)((d, q) =>
        d.withColumnRenamed(s"__b$q", s"${p}_b$q"))

    users
      .crossJoin(broadcast(renamed(boundaries("recency_days"), "r")))
      .crossJoin(broadcast(renamed(boundaries("frequency"), "f")))
      .crossJoin(broadcast(renamed(boundaries("monetary_micro"), "m")))
      .select(col("u").as(userCol), col("recency_days"), col("frequency"),
        col("monetary_micro"),
        (lit(6L) - score("recency_days", "r")).as("r_q"),
        score("frequency", "f").as("f_q"),
        score("monetary_micro", "m").as("m_q"))
      .orderBy(userCol)
  }
}
