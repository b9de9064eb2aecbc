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
    // cumulative counts come from the PrefixSum scan and the totals
    // from a per-metric stat aggregate — no unpartitioned window. The
    // three histograms MELT into one metric-tagged census so the scan's
    // probing action runs ONCE for all three (round-13: the per-call
    // fixed cost q163 paid per metric, now amortized via cumBeforeBy).
    val melted = graft.util.Caches.cached(users
      .select(explode(map(
        lit("r"), col("recency_days"),
        lit("f"), col("frequency"),
        lit("m"), col("monetary_micro"))).as(Seq("metric", "v")))
      .groupBy("metric", "v").agg(count(lit(1)).as("c")))
    val tots = melted.groupBy("metric").agg(sum("c").as("n"))
    val cum = PrefixSum
      .cumBeforeBy(melted, Seq("metric"), "v", "c", "__cb",
        "rfm.boundaries")
      .withColumn("cum", col("__cb") + col("c"))
      .join(broadcast(tots), "metric")
    val boundAggs = (1 to 4).map(q =>
      min(when(col("cum") >= expr(s"($q * n + 4) div 5"), col("v")))
        .as(s"__b$q"))
    val bounds3 = graft.util.Caches.cached(
      cum.groupBy("metric").agg(boundAggs.head, boundAggs.tail: _*))
    // per-metric 1-row boundary relation; a degenerate (empty-events)
    // run yields an empty row set, which only crossJoins into an
    // already-empty users relation — same outcome as the old global agg
    def boundaries(tag: String): DataFrame =
      bounds3.filter(col("metric") === tag).drop("metric")

    def score(metric: String, b: String): Column =
      (1 to 4).map(q =>
        when(col(metric) > col(s"${b}_b$q"), 1L).otherwise(0L))
        .reduce(_ + _) + 1

    def renamed(df: DataFrame, p: String) =
      (1 to 4).foldLeft(df)((d, q) =>
        d.withColumnRenamed(s"__b$q", s"${p}_b$q"))

    users
      .crossJoin(broadcast(renamed(boundaries("r"), "r")))
      .crossJoin(broadcast(renamed(boundaries("f"), "f")))
      .crossJoin(broadcast(renamed(boundaries("m"), "m")))
      .select(col("u").as(userCol), col("recency_days"), col("frequency"),
        col("monetary_micro"),
        (lit(6L) - score("recency_days", "r")).as("r_q"),
        score("frequency", "f").as("f_q"),
        score("monetary_micro", "m").as("m_q"))
      .orderBy(userCol)
  }
}
