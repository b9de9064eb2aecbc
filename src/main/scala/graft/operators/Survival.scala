package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier time-to-event estimation over an event log — "how long
  * until a user first hits X" (first error, first churn signal, first
  * conversion), with censoring done right: users who never hit X by the
  * observation horizon aren't failures at their last day, they're
  * CENSORED there, and treating them as events biases every naive
  * time-to-X histogram downward.
  *
  * Model: per user, entry = first event day; if any row satisfies
  * `eventPred`, the user is OBSERVED at t = first such day − entry;
  * otherwise censored at t = horizon − entry (horizon = corpus max
  * day). Standard right-censoring.
  *
  * Shape: ONE scan to the per-user (entry, first-event-day) aggregate
  * (the event day rides the same aggregate as a conditional min);
  * lifetimes collapse to the (t, events, censored) census — stat-grain,
  * calendar-bounded; at-risk counts and the survival product are
  * windows over those rows. The product Π(1 − dᵢ/nᵢ) follows the house
  * log-domain convention: each factor's ln rounds to integer NANO, the
  * cumulative sum is exact, and survival_ppm = round(exp(cum/10⁹)·10⁶).
  *
  * Output per distinct t: (t, n_at_risk, n_events, n_censored,
  * cum_ln_nano, survival_ppm); after extinction (a level where every
  * at-risk subject events) survival reports 0 with NULL cum_ln_nano.
  */
object Survival {

  def kaplanMeier(events: DataFrame, eventPred: Column,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    // per-user last activity rides the same aggregate, so the horizon
    // (max day over the LOG — a user's last event can postdate every
    // other user's first) derives from the cached user relation: ONE
    // source scan, not two
    val users = graft.util.Caches.cached(events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"),
        eventPred.as("hit"))
      .groupBy("u")
      .agg(min("day").as("entry"),
        min(when(col("hit"), col("day"))).as("event_day"),
        max("day").as("last_day")))
    val horizon = users.agg(max("last_day").as("horizon"))
    val lt = users.crossJoin(broadcast(horizon))
      .select(
        when(col("event_day").isNotNull,
          datediff(col("event_day"), col("entry")))
          .otherwise(datediff(col("horizon"), col("entry")))
          .cast("long").as("t"),
        col("event_day").isNotNull.as("observed"))
    // day-grain lifetime census (calendar-bounded) — ceiling-guarded
    // in-plan before the unpartitioned cumulative windows below
    val census = graft.util.Guards.boundedCensus(
      graft.util.Caches.cached(lt.groupBy("t")
        .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
          sum(when(col("observed"), 0L).otherwise(1L)).as("c"))),
      "kaplanMeier.lifetimeCensus")
    val wAll = Window.partitionBy()
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    census
      .withColumn("n_total", sum(col("d") + col("c")).over(wAll))
      .withColumn("n_at_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(wBefore),
          lit(0L)))
      .withColumn("cell_nano",
        when(col("d") > 0 && col("n_at_risk") > col("d"),
          round(log((col("n_at_risk") - col("d")).cast("double") /
            col("n_at_risk")) * lit(1e9)).cast("long"))
          .when(col("d") === col("n_at_risk"), lit(null).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("cum_ln_nano", sum("cell_nano").over(wCum))
      .withColumn("extinct",
        max((col("d") === col("n_at_risk")).cast("int")).over(wCum))
      .select(col("t"), col("n_at_risk"), col("d").as("n_events"),
        col("c").as("n_censored"),
        when(col("extinct") === 0, col("cum_ln_nano")).as("cum_ln_nano"),
        when(col("extinct") === 1, lit(0L)).otherwise(
          round(exp(col("cum_ln_nano").cast("double") / 1e9) * lit(1e6))
            .cast("long")).as("survival_ppm"))
      .orderBy("t")
  }

  /** NELSON–AALEN cumulative hazard (public method: Nelson 1972;
    * Aalen 1978) — H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ over the same right-censored
    * lifetime census as [[kaplanMeier]]. The hazard is the curve a
    * capacity/reliability read wants (additive, defined even after the
    * risk set empties), and unlike the KM product it needs NO
    * transcendental: every increment is one micro floor division
    * (dᵢ·10⁶ div nᵢ — the documented q210a quantization contract) and
    * the curve is a cumulative integer sum, so the oracle is
    * bit-identical with no ln/exp ULP exposure at any scale.
    *
    * Output per distinct lifetime t: (t, n_at_risk, n_events,
    * n_censored, hazard_micro).
    */
  def nelsonAalen(events: DataFrame, eventPred: Column,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val users = graft.util.Caches.cached(events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"),
        eventPred.as("hit"))
      .groupBy("u")
      .agg(min("day").as("entry"),
        min(when(col("hit"), col("day"))).as("event_day"),
        max("day").as("last_day")))
    val horizon = users.agg(max("last_day").as("horizon"))
    val lt = users.crossJoin(broadcast(horizon))
      .select(
        when(col("event_day").isNotNull,
          datediff(col("event_day"), col("entry")))
          .otherwise(datediff(col("horizon"), col("entry")))
          .cast("long").as("t"),
        col("event_day").isNotNull.as("observed"))
    // same day-grain guarded census as kaplanMeier
    val census = graft.util.Guards.boundedCensus(
      graft.util.Caches.cached(lt.groupBy("t")
        .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
          sum(when(col("observed"), 0L).otherwise(1L)).as("c"))),
      "nelsonAalen.lifetimeCensus")
    val wAll = Window.partitionBy()
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    census
      .withColumn("n_total", sum(col("d") + col("c")).over(wAll))
      .withColumn("n_at_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(wBefore),
          lit(0L)))
      .withColumn("cell_micro",
        when(col("d") > 0, expr("(d * 1000000) div n_at_risk"))
          .otherwise(lit(0L)))
      .withColumn("hazard_micro", sum("cell_micro").over(wCum))
      .select(col("t"), col("n_at_risk"), col("d").as("n_events"),
        col("c").as("n_censored"), col("hazard_micro"))
      .orderBy("t")
  }

  /** Log-rank test — "do the two arms' survival curves differ": the
    * standard two-sample comparison over right-censored lifetimes
    * (Mantel–Haenszel form), the inferential companion
    * [[kaplanMeier]]'s descriptive curve needs. At every pooled event
    * time, group A's observed events compare against the expected
    * count under the null (events split by at-risk share); the
    * hypergeometric-variance-normalized square is χ² with 1 df.
    *
    * `groupPred` marks group A per event row and must be user-constant
    * (it reduces by max over the user's rows). Same lifetime model and
    * scan shape as [[kaplanMeier]]: ONE scan to user grain, a
    * (t, group) census, then windows over the day-bounded stat grid —
    * per-group at-risk counts derive from cumulative sums, absent
    * (t, group) cells fill zero via the t-grid left join (stat-grain).
    * All counts are exact integers; O−E and V derive identically in
    * SQL (the proportionZ convention) and χ² rounds at 6 dp.
    *
    * Output (ONE row): (n_a, n_b, events_a, events_b, chi2) — event
    * counts over the INFORMATIVE times (both groups at risk, ≥1 pooled
    * event: exactly the 2×2 tables the statistic reads); EMPTY result
    * when no time is informative.
    */
  def logRank(events: DataFrame, eventPred: Column, groupPred: Column,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    // same one-scan shape as kaplanMeier: horizon off the cached
    // user-grain relation
    val users = graft.util.Caches.cached(events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"),
        eventPred.as("hit"), groupPred.as("ga"))
      .groupBy("u")
      .agg(min("day").as("entry"),
        min(when(col("hit"), col("day"))).as("event_day"),
        max("day").as("last_day"),
        max(col("ga")).as("is_a")))
    val horizon = users.agg(max("last_day").as("horizon"))
    val lt = users.crossJoin(broadcast(horizon))
      .select(
        when(col("event_day").isNotNull,
          datediff(col("event_day"), col("entry")))
          .otherwise(datediff(col("horizon"), col("entry")))
          .cast("long").as("t"),
        col("event_day").isNotNull.as("observed"), col("is_a"))
    val census = graft.util.Guards.boundedCensus(
      graft.util.Caches.cached(lt.groupBy("t")
      .agg(sum(when(col("observed") && col("is_a"), 1L).otherwise(0L))
          .as("d1"),
        sum(when(col("observed") && !col("is_a"), 1L).otherwise(0L))
          .as("d2"),
        sum(when(!col("observed") && col("is_a"), 1L).otherwise(0L))
          .as("c1"),
        sum(when(!col("observed") && !col("is_a"), 1L).otherwise(0L))
          .as("c2"))),
      "logRank.lifetimeCensus")
    val wAll = Window.partitionBy()
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = census
      .withColumn("na_tot", sum(col("d1") + col("c1")).over(wAll))
      .withColumn("nb_tot", sum(col("d2") + col("c2")).over(wAll))
      .withColumn("n1", col("na_tot") -
        coalesce(sum(col("d1") + col("c1")).over(wBefore), lit(0L)))
      .withColumn("n2", col("nb_tot") -
        coalesce(sum(col("d2") + col("c2")).over(wBefore), lit(0L)))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      // only pooled event times with both groups at risk inform the
      // statistic (V = 0 otherwise)
      .filter(col("d") > 0 && col("n1") > 0 && col("n2") > 0 &&
        col("n") > 1)
    // per-time O−E and V round to integer NANO before summing (the
    // q152 cell convention): the accumulators are exact integers, so
    // the cross-engine float-sum-order hazard never reaches the hash
    val e1 = col("d").cast("double") * col("n1") / col("n")
    val v = col("d").cast("double") * (col("n1").cast("double") / col("n")) *
      (col("n2").cast("double") / col("n")) *
      ((col("n") - col("d")).cast("double") / (col("n") - 1))
    risk
      .select(col("na_tot"), col("nb_tot"), col("d1"), col("d2"),
        round((col("d1") - e1) * lit(1e9)).cast("long").as("ome_nano"),
        round(v * lit(1e9)).cast("long").as("v_nano"))
      .groupBy("na_tot", "nb_tot")
      .agg(sum("d1").as("events_a"), sum("d2").as("events_b"),
        sum("ome_nano").as("so"), sum("v_nano").as("sv"))
      .select(col("na_tot").as("n_a"), col("nb_tot").as("n_b"),
        col("events_a"), col("events_b"),
        when(col("sv") > 0,
          round((col("so").cast("double") / 1e9) *
            (col("so").cast("double") / 1e9) /
            (col("sv").cast("double") / 1e9), 6)).as("chi2"))
  }
}
