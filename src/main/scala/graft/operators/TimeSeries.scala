package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling calendar-window aggregates over an event log — the
  * daily/rolling activity report (DAU / 7-day WAU / rolling volume) every
  * analytics deployment publishes from its event stream.
  *
  * Extends the reference's fixed event-time buckets (the continuous-sync
  * cycle counting of `/root/reference/databand_airflow_monitor.py:102-115`,
  * our q25/q26 hourly windows) with SLIDING windows, including the
  * rolling DISTINCT count that a plain windowed aggregate cannot express.
  *
  * Scale shape — no window function touches data rows:
  *  - The event log reduces FIRST: one distinct on (day, user) for the
  *    activity relation, one (day) aggregate for volume. Both are hash
  *    aggregates with map-side partials; the shuffles carry stat-scale
  *    relations (days × active users, days).
  *  - Rolling = each daily row EXPLODES to the ≤ `windowDays` target days
  *    it contributes to (`sequence(day, day+w−1)`), then re-aggregates
  *    keyed by target day. Fan-out is windowDays× a daily-scale relation
  *    — never the event log — and the rolling distinct falls out of the
  *    same two-level (day, user) → day aggregate.
  *  - Target days clamp to the observed [min, max] via a broadcast
  *    bounds row, so no phantom partial windows appear past the range.
  *
  * Determinism: daily value sums quantize to integer micro-points at the
  * scan (the q53/q83 convention), so every downstream Σ — including the
  * rolling one — is an integer sum, order-independent and cross-engine
  * exact.
  */
object TimeSeries {

  /** Daily + rolling activity report:
    * `(day, dau, n_events, wau, n_events_roll, value_roll)` where the
    * `*_roll`/`wau` columns aggregate the trailing `windowDays`-day
    * window ending at `day` (partial at the head of the range, as every
    * rolling report is).
    */
  def rollingActivity(events: DataFrame, windowDays: Int = 7,
      tsCol: String = "ts", userCol: String = "user_id",
      valCol: String = "value"): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val base = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("u"),
        round(col(valCol).cast("double") * 1000000.0).cast("long")
          .as("v_micro"))

    // the (day, user)-grain aggregate is the ONE pass over the event
    // log — everything below (daily volume, DAU, WAU spread) derives
    // from it, so it is cached (graft.util.Caches.releaseAll drops it
    // at pipeline boundaries); without the cache each consumer re-runs
    // the full scan (5 events scans measured at audit time)
    val du = graft.util.Caches.cached(
      base.groupBy("day", "u")
        .agg(count(lit(1)).as("n"), sum("v_micro").as("v_micro")))
    val daily = du.groupBy("day")
      .agg(sum("n").as("n_events"), sum("v_micro").as("v_micro"))
    val dayUser = du.select("day", "u")
    // du's grain is distinct (day, user), so DAU is a plain count
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val limits = daily.agg(max("day").as("max_day"))

    def spread(df: DataFrame) = df
      .crossJoin(broadcast(limits))
      .withColumn("t_day",
        explode(sequence(col("day"), least(date_add(col("day"),
          windowDays - 1), col("max_day")))))

    val roll = spread(daily).groupBy(col("t_day").as("day"))
      .agg(sum("n_events").as("n_events_roll"),
        round(sum("v_micro") / 1000000.0, 4).as("value_roll"))
    val wau = spread(dayUser).select(col("t_day"), col("u")).distinct()
      .groupBy(col("t_day").as("day")).agg(count(lit(1)).as("wau"))

    daily.join(dau, "day").join(wau, "day").join(roll, "day")
      .select(col("day"), col("dau"), col("n_events"), col("wau"),
        col("n_events_roll"), col("value_roll"))
      .orderBy("day")
  }

  /** Cohort retention matrix: users cohort by their FIRST active day;
    * each later active day lands in period ⌊(day − cohort_day)/periodDays⌋,
    * and the cell reports how many cohort members were active in that
    * period (plus the share of the cohort, in basis points — period 0 is
    * 10000 by construction since the first active day is in period 0).
    *
    * Scale shape: ONE scan — the event log reduces to the distinct
    * (day, user) activity relation (one shuffle on the pair), the
    * cohort day arrives as a per-user min WINDOW column (one shuffle on
    * the high-cardinality user key, no join back), and the
    * checkpointed cohorts × periods cell matrix feeds both the report
    * and its own period-0 slice (= the cohort sizes, since every
    * member is active on their first day).
    *
    * Determinism: day arithmetic is integer (datediff / integer period
    * division of non-negative deltas); counts are exact; the only double
    * is the final share, rounded at 4 dp.
    */
  def cohortRetention(events: DataFrame, periodDays: Int = 7,
      tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val activity = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("u"))
      .distinct()
    // cohort day = per-user min as a WINDOW column (the q105 shape):
    // one shuffle on the high-cardinality user key, no join back, and
    // the event log is scanned exactly once. The stat-scale cell matrix
    // (cohorts × periods) is checkpointed because it is consumed twice
    // (cells + its own period-0 slice); re-deriving it would re-run the
    // whole corpus lineage per consumer.
    val withCohort = activity.withColumn("cohort_day",
      min("day").over(org.apache.spark.sql.expressions.Window
        .partitionBy("u")))
    val cells = withCohort
      .select(col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / periodDays)
          .cast("int").as("period"), col("u"))
      .distinct()
      .groupBy("cohort_day", "period")
      .agg(count(lit(1)).as("active_users"))
      .localCheckpoint()
    // every cohort member is active on their first day, so the period-0
    // cell IS the cohort size
    val sizes = cells.where(col("period") === 0)
      .select(col("cohort_day"), col("active_users").as("cohort_users"))
    cells.join(sizes, "cohort_day")
      .select(col("cohort_day").cast("string").as("cohort_day"),
        col("period"), col("active_users"), col("cohort_users"),
        round(col("active_users") * 10000.0 / col("cohort_users"), 4)
          .as("retention_bp"))
      .orderBy("cohort_day", "period")
  }

  /** SCD2-style change intervals: collapse a keyed event/snapshot stream
    * into state-validity runs — for each key, consecutive observations
    * of the SAME state merge into one `(key, state, valid_from,
    * valid_to, n_obs)` interval, `valid_to` null for the current (open)
    * run. The slowly-changing-dimension history builder every warehouse
    * pipeline carries, built from the raw stream instead of a merge
    * loop.
    *
    * Shape: ONE shuffle, ONE sort (plan-gated). Every window — lag,
    * row_number, the per-key total count, and the leads over the
    * filtered change rows — shares the (key | ts, state) partitioning
    * and ordering, and run aggregation is ARITHMETIC, not a groupBy:
    * a run's observation count is the row-number gap to the next change
    * row, so no (key, run)-keyed exchange ever happens. Ties on ts
    * break by the state value so runs are deterministic under duplicate
    * timestamps.
    */
  def changeIntervals(df: DataFrame, keyCol: String, stateCol: String,
      tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("state").asc)
    val marked = df
      .select(col(keyCol).as("key"), col(stateCol).as("state"),
        col(tsCol).as("ts"))
      .withColumn("__prev", lag("state", 1).over(byKey))
      .withColumn("__rn", row_number().over(byKey))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("key")))
    // change rows carry their run's start; the next change row (same
    // partitioning + ordering — the filter preserves both) closes it
    marked
      .filter(col("__prev").isNull || col("__prev") =!= col("state"))
      .withColumn("valid_to", lead("ts", 1).over(byKey))
      .withColumn("n_obs",
        coalesce(lead("__rn", 1).over(byKey) - col("__rn"),
          col("__n") - col("__rn") + 1L))
      .select(col("key"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("n_obs"))
  }

  /** Per-key linear trend (OLS slope) of daily metric volume — "is this
    * source's daily revenue growing or decaying, and how fast?", the
    * first-derivative companion to [[rollingActivity]] and the drift
    * family's answer for MONOTONE change (PSI/KL see distribution shape,
    * not direction).
    *
    * Shape: the event log reduces FIRST to the (key, day, Σ value_micro)
    * daily relation (one scan, map-side partials); the regression is a
    * closed-form aggregate over those daily STAT rows — no window, no
    * join except the 1-row broadcast bounds relation that anchors
    * x = day − min_day (frozen global origin, the PSI bounds move, so
    * every key's slope shares the same x scale and the integer sums stay
    * small).
    *
    * Determinism: x is an exact small integer, y an exact micro-integer;
    * n, Σx, Σy, Σx², Σxy accumulate as DECIMAL(38,0) (the pearsonMatrix
    * convention). slope_num = n·Σxy − Σx·Σy and slope_den = n·Σx² −
    * (Σx)² are exact integers (reported as the hash-stable core);
    * `slope_micro_per_day` = num/den in double rounded 6 dp is the
    * convenience view. den = 0 (single observed day) ⇒ NULL slope.
    */
  def trendReport(events: DataFrame, keyCol: String, tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    val dec = "decimal(38,0)"
    val daily0 = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y"))
    val bounds = daily0.agg(min("day").as("day0"))
    val daily = daily0.crossJoin(broadcast(bounds))
      .withColumn("x", datediff(col("day"), col("day0")).cast("long"))
    val stats = daily.groupBy("key").agg(
      count(lit(1)).as("n_days"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
    val n = col("n_days").cast(dec)
    stats
      .withColumn("slope_num",
        (n * col("sxy") - col("sx") * col("sy")).cast("long"))
      .withColumn("slope_den",
        (n * col("sxx") - col("sx") * col("sx")).cast("long"))
      .withColumn("slope_micro_per_day",
        when(col("slope_den") > 0,
          round(col("slope_num").cast("double") /
            col("slope_den").cast("double"), 6)))
      .select(col("key").as(keyCol), col("n_days"), col("slope_num"),
        col("slope_den"), col("slope_micro_per_day"))
      .orderBy(keyCol)
  }

  /** One-sided (upper) CUSUM changepoint detection per key over the
    * daily volume series — the classic sequential drift detector for
    * "when did this source's volume shift upward": S₀ = 0,
    * Sₜ = max(0, Sₜ₋₁ + yₜ − μ − k), where μ is the key's mean daily
    * micro-volume (floored) and k = μ·slackPermille/1000 the allowance.
    * The report carries the peak statistic and the day it was FIRST
    * reached — the changepoint estimate.
    *
    * A recursion can't be a window function, but it doesn't need the
    * corpus either: the fold runs over the per-key DAILY series —
    * stat-grain (keys × days), bounded by the calendar, not the data —
    * as an `aggregate` higher-order fold over the key's sorted
    * (day, y) array, all integer arithmetic. ONE corpus scan into the
    * daily aggregate; everything after is per-key array math (a key's
    * full history rides one row — ~10⁴ days is a few hundred KB, fine;
    * beyond that, window the input by year first).
    *
    * Output: (key, n_days, mu_floor, slack, cusum_max, peak_day) —
    * peak_day NULL when the statistic never rises above 0.
    */
  def cusumReport(events: DataFrame, keyCol: String, tsCol: String = "ts",
      valCol: String = "value", slackPermille: Long = 50L): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y"))
    daily
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"), sum("y").as("sy"),
        sort_array(collect_list(struct(col("day"), col("y")))).as("arr"))
      .withColumn("mu_floor", expr("sy div n_days"))
      .withColumn("slack", expr(s"(mu_floor * $slackPermille) div 1000"))
      .withColumn("fold", expr(
        """aggregate(arr,
          |  named_struct('s', 0L, 'smax', 0L, 'peak', CAST(NULL AS DATE)),
          |  (acc, x) -> named_struct(
          |    's', greatest(0L, acc.s + x.y - mu_floor - slack),
          |    'smax', CASE
          |      WHEN greatest(0L, acc.s + x.y - mu_floor - slack) > acc.smax
          |      THEN greatest(0L, acc.s + x.y - mu_floor - slack)
          |      ELSE acc.smax END,
          |    'peak', CASE
          |      WHEN greatest(0L, acc.s + x.y - mu_floor - slack) > acc.smax
          |      THEN x.day ELSE acc.peak END))""".stripMargin))
      .select(col("key").as(keyCol), col("n_days"), col("mu_floor"),
        col("slack"), col("fold.smax").as("cusum_max"),
        col("fold.peak").as("peak_day"))
      .orderBy(keyCol)
  }

  /** PAGE–HINKLEY drift detector over the daily VOLUME series (public
    * method: Page 1954; the streaming-drift standard, e.g. Gama et
    * al.'s survey) — [[cusumReport]]'s complement: CUSUM tests
    * against the series' GLOBAL mean (a retrospective audit), PH
    * tracks deviation from the RUNNING mean, which is what an online
    * monitor actually has. `PH_t = U_t − min_{s≤t} U_s` with
    * `U_t = Σ_{i≤t} (x_i − x̄_i − δ)`, alarm when PH exceeds λ.
    *
    * Everything is exact integer on the calendar-bounded daily
    * census: the running mean is the floor `cum div i`, every term
    * and cumulative is a long, and the two cumulative windows ride
    * one per-key day sort. Output per (key, day): (key, day, x,
    * ph_stat, alarm), ordered.
    */
  def pageHinkleyReport(events: DataFrame, keyCol: String,
      tsCol: String = "ts", deltaCount: Long = 0L,
      lambdaCount: Long = 10L): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day").agg(count(lit(1)).as("x"))
    val byDay = Window.partitionBy("key").orderBy("day")
    val w = byDay.rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("i", row_number().over(byDay))
      .withColumn("cum", sum("x").over(w))
      .withColumn("term",
        col("x") - expr("cum div i") - lit(deltaCount))
      .withColumn("u", sum("term").over(w))
      .withColumn("minu", min("u").over(w))
      .select(col("key").as(keyCol), col("day"), col("x"),
        (col("u") - col("minu")).as("ph_stat"),
        (col("u") - col("minu") > lambdaCount).as("alarm"))
      .orderBy(keyCol, "day")
  }

  /** Theil–Sen robust slope per key over the daily series — the
    * median-of-pairwise-slopes estimator, immune to the outlier days
    * that drag [[trendReport]]'s OLS around (a crawler outage or a
    * backfill spike is one point to Theil–Sen, not a lever arm).
    *
    * The pair stage is CALENDAR-grain, not corpus-grain: the self-join
    * runs on the per-key daily aggregate (cached census — ONE corpus
    * scan), so a year of days is ~6.6·10⁴ pairs per key regardless of
    * row count. Each pair's slope rounds HALF_UP to integer
    * micro-per-day; the median is the house doubled-integer convention
    * (`med2` = lower + upper middle of the sorted slopes — exact, no
    * float averaging), with `slope_micro_per_day` = med2/2 at 1 dp.
    */
  def theilSen(events: DataFrame, keyCol: String, tsCol: String = "ts",
      valCol: String = "value"): DataFrame = {
    val daily0 = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y"))
    val bounds = daily0.agg(min("day").as("day0"))
    val daily = graft.util.Caches.cached(
      daily0.crossJoin(broadcast(bounds))
        .withColumn("x", datediff(col("day"), col("day0")).cast("long")))
    val slopes = daily.as("a").join(daily.as("b"),
        col("a.key") === col("b.key") && col("b.x") > col("a.x"))
      .select(col("a.key").as("key"),
        round((col("b.y") - col("a.y")).cast("double") /
          (col("b.x") - col("a.x"))).cast("long").as("slope"))
    slopes
      .groupBy("key")
      .agg(count(lit(1)).as("n_pairs"),
        sort_array(collect_list(col("slope"))).as("arr"))
      .withColumn("med2",
        element_at(col("arr"), expr("CAST((n_pairs + 1) div 2 AS INT)")) +
          element_at(col("arr"), expr("CAST(n_pairs div 2 + 1 AS INT)")))
      .select(col("key").as(keyCol), col("n_pairs"), col("med2"),
        round(col("med2").cast("double") / 2, 1).as("slope_micro_per_day"))
      .orderBy(keyCol)
  }

  /** Day-of-week seasonal indices per key: each weekday's mean daily
    * volume relative to the key's overall mean, in exact integer PPM —
    * `idx_ppm = (s_dow·n_days·10⁶) div (n_dow·s_total)` (≈10⁶ = flat).
    * The standard "is Sunday volume structurally low or is today an
    * incident" baseline behind [[rollingActivity]]-style monitors.
    *
    * ONE scan into the daily aggregate (MILLI units — the triple
    * product s_dow·n_days·10⁶ must hold in Long; milli keeps it exact
    * through ~10¹⁵ milli-units of daily volume); the dow rollup and
    * per-key totals are windows over ≤ 7·keys stat rows.
    */
  def seasonalityReport(events: DataFrame, keyCol: String,
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e3).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y"))
    val byDow = daily
      .withColumn("dow", dayofweek(col("day")))
      .groupBy("key", "dow")
      .agg(count(lit(1)).as("n_days_dow"), sum("y").as("s_dow"))
    val wk = Window.partitionBy("key")
    byDow
      .withColumn("n_days", sum("n_days_dow").over(wk))
      .withColumn("s_total", sum("s_dow").over(wk))
      .withColumn("idx_ppm",
        expr("(s_dow * n_days * 1000000) div (n_days_dow * s_total)"))
      .select(col("key").as(keyCol), col("dow"), col("n_days_dow"),
        col("s_dow").as("s_dow_milli"), col("n_days"),
        col("s_total").as("s_total_milli"), col("idx_ppm"))
      .orderBy(keyCol, "dow")
  }

  /** Lag-1 autocorrelation of the daily series per key — the "is
    * today's volume predicted by yesterday's" diagnostic separating
    * trending/sticky series from white noise (high ACF₁ means
    * [[cusumReport]]-style drift detectors need wider slack).
    *
    * Sample ACF with the overall mean, denominators cleared:
    * r₁ = Σ(n·yₜ−S)(n·yₜ₊₁−S) / Σ(n·yₜ−S)² over consecutive-day pairs
    * (gaps excluded by the x+1 equi-join). Each product term is exact
    * DECIMAL(38,0), rounded to integer MILLI² after dividing by n²
    * (the ANOVA convention — integer totals are combine-order-free).
    * Daily values quantize at MILLI for the same headroom reason.
    *
    * ONE corpus scan into the cached daily census; the lag pairing is a
    * calendar-grain self-join. Output: (key, n_days, n_pairs,
    * num_milli2, den_milli2, acf1).
    */
  def autocorrReport(events: DataFrame, keyCol: String,
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val dec = "decimal(38,0)"
    val daily0 = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e3).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y"))
    val bounds = daily0.agg(min("day").as("day0"))
    val daily = graft.util.Caches.cached(
      daily0.crossJoin(broadcast(bounds))
        .withColumn("x", datediff(col("day"), col("day0")).cast("long")))
    val stats = daily.groupBy("key")
      .agg(count(lit(1)).as("n_days"), sum("y").as("s_all"))
    val withStats = daily.join(broadcast(stats), Seq("key"))
    val centeredSq = {
      val d = col("y").cast(dec) * col("n_days") - col("s_all").cast(dec)
      round((d * d).cast("double") /
        (col("n_days").cast("double") * col("n_days"))).cast("long")
    }
    val den = withStats
      .groupBy("key").agg(sum(centeredSq).as("den_milli2"),
        max("n_days").as("n_days"))
    val lagged = withStats.as("a").join(
        withStats.as("b").select(col("key").as("bk"), col("x").as("bx"),
          col("y").as("by")),
        col("a.key") === col("bk") && col("a.x") + 1 === col("bx"))
    val crossTerm = {
      val da = col("a.y").cast(dec) * col("a.n_days") - col("a.s_all").cast(dec)
      val db = col("by").cast(dec) * col("a.n_days") - col("a.s_all").cast(dec)
      round((da * db).cast("double") /
        (col("a.n_days").cast("double") * col("a.n_days"))).cast("long")
    }
    val num = lagged.groupBy(col("a.key").as("key"))
      .agg(count(lit(1)).as("n_pairs"), sum(crossTerm).as("num_milli2"))
    den.join(num, Seq("key"), "left")
      .na.fill(0L, Seq("n_pairs"))
      .withColumn("acf1",
        when(col("den_milli2") > 0 && col("n_pairs") > 0,
          round(col("num_milli2").cast("double") / col("den_milli2"), 6)))
      .select(col("key").as(keyCol), col("n_days"), col("n_pairs"),
        col("num_milli2"), col("den_milli2"), col("acf1"))
      .orderBy(keyCol)
  }

  /** Mann–Kendall trend test per key — the nonparametric companion of
    * [[theilSen]]: S = Σᵢ<ⱼ sign(yⱼ−yᵢ) over the daily series, with the
    * tie-corrected variance 18·Var(S) = n(n−1)(2n+5) − Σₜ t(t−1)(2t+5)
    * (t = tied-value run lengths from the value census). Both cores are
    * exact integers; the z statistic applies the standard ±1 continuity
    * correction at 6 dp.
    *
    * Same calendar-grain pair join as [[theilSen]] (cached census, ONE
    * corpus scan); the tie census is value-domain.
    */
  def mannKendall(events: DataFrame, keyCol: String,
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val daily = graft.util.Caches.cached(events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y")))
    val pairs = daily.as("a").join(
        daily.as("b").select(col("key").as("bk"), col("day").as("bd"),
          col("y").as("by")),
        col("a.key") === col("bk") && col("a.day") < col("bd"))
      .select(col("a.key").as("key"),
        signum(col("by") - col("a.y")).cast("long").as("sgn"))
    val sStat = pairs.groupBy("key")
      .agg(count(lit(1)).as("n_pairs"), sum("sgn").as("s_stat"))
    val ties = daily.groupBy("key", "y").agg(count(lit(1)).as("t"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_distinct"), sum("t").as("n_days"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("tie_term"))
    ties.join(sStat, Seq("key"), "left")
      .na.fill(0L, Seq("n_pairs", "s_stat"))
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1) *
          (lit(2) * col("n_days") + 5) - col("tie_term"))
      .withColumn("z_stat",
        when(col("var18") > 0,
          round(
            when(col("s_stat") > 0, col("s_stat") - 1)
              .when(col("s_stat") < 0, col("s_stat") + 1)
              .otherwise(lit(0L)).cast("double") /
              sqrt(col("var18").cast("double") / 18.0), 6)))
      .select(col("key").as(keyCol), col("n_days"), col("n_distinct"),
        col("n_pairs"), col("s_stat"), col("var18"), col("z_stat"))
      .orderBy(keyCol)
  }

  /** Trailing-window exact P95 of the event value per day — the rolling
    * order statistic behind latency/volume SLO dashboards ("p95 over
    * the last 7 days, daily"). Entirely VALUE-DOMAIN: one scan to the
    * (day, value) census, a ≤window-fold fan of census STAT rows onto
    * their target days (banded range join), then the house
    * conditional-min window picks the smallest value whose cumulative
    * count reaches ⌈q·n⌉. No per-row windows, no re-scans.
    *
    * Output: (day, n_window, rank_q, p95_micro) — `n_window` counts the
    * trailing-window rows, `rank_q` = ⌈0.95·n⌉.
    */
  def rollingP95(events: DataFrame, windowDays: Int = 7,
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val census = graft.util.Caches.cached(events
      .select(to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("day", "vm").agg(count(lit(1)).as("c")))
    val days = census.select("day").distinct()
    val fan = days.as("d").join(census.as("h"),
        col("h.day") <= col("d.day") &&
          col("h.day") > date_sub(col("d.day"), windowDays))
      .groupBy(col("d.day").as("day"), col("h.vm").as("vm"))
      .agg(sum("h.c").as("c"))
    val wDay = Window.partitionBy("day")
    val wCum = wDay.orderBy("vm")
      .rowsBetween(Window.unboundedPreceding, 0)
    fan
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n_window", sum("c").over(wDay))
      .withColumn("rank_q", expr("(19 * n_window + 19) div 20"))
      .groupBy("day", "n_window", "rank_q")
      .agg(min(when(col("cum") >= col("rank_q"), col("vm")))
        .as("p95_micro"))
      .select("day", "n_window", "rank_q", "p95_micro")
      .orderBy("day")
  }

  /** Integer EWMA one-step forecaster per key: s₁ = y₁,
    * sₜ = (3·sₜ₋₁ + yₜ) div 4 (α = ¼ in exact integer arithmetic — no
    * float drift, replayable in a recursive CTE), with the mean
    * absolute one-step prediction error |yₜ − sₜ₋₁| as the
    * forecastability score (a key whose EWMA tracks poorly is the one
    * whose volume alerts deserve wide bands — the [[cusumReport]] /
    * [[autocorrReport]] operating companion).
    *
    * Same shape as [[cusumReport]]: ONE scan to the daily aggregate,
    * then an integer `aggregate` fold over each key's sorted calendar
    * array. Output: (key, n_days, ewma_final, mae_micro) — mae NULL
    * for single-day keys.
    */
  def ewmaForecast(events: DataFrame, keyCol: String,
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y"))
    daily
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("y")))).as("arr"))
      .withColumn("fold", expr(
        """aggregate(arr,
          |  named_struct('s', CAST(NULL AS BIGINT), 'ae', 0L),
          |  (acc, x) -> CASE WHEN acc.s IS NULL
          |    THEN named_struct('s', x.y, 'ae', 0L)
          |    ELSE named_struct(
          |      's', (3 * acc.s + x.y) div 4,
          |      'ae', acc.ae + abs(x.y - acc.s)) END)""".stripMargin))
      .select(col("key").as(keyCol), col("n_days"),
        col("fold.s").as("ewma_final"),
        when(col("n_days") > 1,
          expr("fold.ae div (n_days - 1)")).as("mae_micro"))
      .orderBy(keyCol)
  }

  /** Holt linear-trend forecaster per key (double exponential
    * smoothing, α = β = ¼) — [[ewmaForecast]]'s sibling for series with
    * drift: EWMA lags a trending series by construction; Holt carries
    * an explicit trend term, so its one-step error on drifting volume
    * is the honest forecastability score.
    *
    * Exact integer recurrences over each key's SORTED daily array:
    * `l₁ = y₁, b₁ = 0`, prediction `p = l + b`,
    * `lₜ = (3p + yₜ) div 4`, `bₜ = (3b + (lₜ − lₜ₋₁)) div 4` — the
    * trend goes NEGATIVE on falling series, and BOTH engines truncate
    * integer division toward zero (Spark `div` ≡ DuckDB `//`,
    * verified on negatives), so the recursive-CTE oracle replays the
    * recurrence bit-for-bit. Same shape as
    * [[cusumReport]]/[[ewmaForecast]]: ONE scan to the daily
    * aggregate, one integer fold.
    *
    * Output: (key, n_days, level_final, trend_final, forecast_next,
    * mae_micro) — mae NULL for single-day keys.
    */
  def holtForecast(events: DataFrame, keyCol: String,
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y"))
    val pred = "(acc.l + acc.b)"
    val lt = s"((3 * $pred + x.y) div 4)"
    val bt = s"((3 * acc.b + ($lt - acc.l)) div 4)"
    daily
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("y")))).as("arr"))
      .withColumn("fold", expr(
        s"""aggregate(arr,
           |  named_struct('l', CAST(NULL AS BIGINT), 'b', 0L, 'ae', 0L),
           |  (acc, x) -> CASE WHEN acc.l IS NULL
           |    THEN named_struct('l', x.y, 'b', 0L, 'ae', 0L)
           |    ELSE named_struct(
           |      'l', $lt,
           |      'b', $bt,
           |      'ae', acc.ae + abs(x.y - $pred)) END)""".stripMargin))
      .select(col("key").as(keyCol), col("n_days"),
        col("fold.l").as("level_final"),
        col("fold.b").as("trend_final"),
        (col("fold.l") + col("fold.b")).as("forecast_next"),
        when(col("n_days") > 1,
          expr("fold.ae div (n_days - 1)")).as("mae_micro"))
      .orderBy(keyCol)
  }

  /** Fano-factor overdispersion check per key: the variance-to-mean
    * ratio of DAILY event counts — Poisson-like steady traffic reads
    * ~1, bursty/clumped traffic reads > 1 — the one-number "does this
    * key need burst-tolerant alert bands" gate feeding
    * [[cusumReport]]/[[ewmaForecast]] band widths.
    *
    * Fully integer: with daily counts c over n days,
    * `var/mean = var_num / ((n−1)·Σc)` where
    * `var_num = n·Σc² − (Σc)²` — an exact rational, reported as ppm
    * floor division. No doubles anywhere. One scan to the daily
    * aggregate, one stat-grain re-aggregate.
    *
    * Output: (key, n_days, sum_events, var_num, fano_ppm,
    * overdispersed) — ratio columns NULL for single-day keys.
    */
  def fanoReport(events: DataFrame, keyCol: String,
      tsCol: String = "ts"): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day").agg(count(lit(1)).as("c"))
    daily
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"), sum("c").as("sum_events"),
        sum(col("c") * col("c")).as("scc"))
      .select(col("key").as(keyCol), col("n_days"), col("sum_events"),
        (col("n_days") * col("scc") -
          col("sum_events") * col("sum_events")).as("var_num"))
      .withColumn("fano_ppm",
        when(col("n_days") > 1 && col("sum_events") > 0,
          expr("(var_num * 1000000L) div ((n_days - 1) * sum_events)")))
      .withColumn("overdispersed",
        when(col("fano_ppm").isNotNull, col("fano_ppm") > 1000000L))
      .orderBy(keyCol)
  }

  /** Inter-arrival (inter-event gap) distribution per key: how often
    * does each user fire each event type, and what does the cadence
    * distribution look like — the usage-rhythm report behind session-gap
    * tuning ([[Sessionize]]'s gapSeconds is exactly a quantile of this
    * distribution) and ingest-lag monitoring.
    *
    * Gaps are consecutive-event deltas per (user, key) in exact
    * MICROseconds (`unix_micros`, ties broken by the id column so the
    * lag is deterministic under any row order). The per-user lag window
    * partitions by the high-cardinality (user, key) pair — millions of
    * small partitions, never a corpus-wide sort. Gap rows then collapse
    * to a (key, gap) census, and the quartiles come from the house
    * value-domain order-statistic pick (conditional min at ⌈q·n⌉ —
    * windows run over census STAT rows only, the q163 anti-ntile
    * argument).
    *
    * Output: (key, n_gaps, mean_us, p25_us, p50_us, p75_us, p90_us),
    * key-ordered; mean is the exact floor division Σgap div n.
    */
  def interArrivalReport(events: DataFrame, keyCol: String,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol), col(keyCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val gaps = events
      .withColumn("__t", unix_micros(col(tsCol)))
      .withColumn("dt", col("__t") - lag("__t", 1).over(byUser))
      .filter(col("dt").isNotNull)
    val census = gaps.groupBy(col(keyCol).as("key"), col("dt"))
      .agg(count(lit(1)).as("c"))
    val wk = Window.partitionBy("key")
    val wCum = wk.orderBy("dt").rowsBetween(Window.unboundedPreceding, 0)
    def pick(rankExpr: String, name: String) =
      min(when(col("cum") >= expr(rankExpr), col("dt"))).as(name)
    census
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wk))
      .withColumn("s", sum(col("dt") * col("c")).over(wk))
      .groupBy("key", "n", "s")
      .agg(
        pick("(n + 3) div 4", "p25_us"),
        pick("(n + 1) div 2", "p50_us"),
        pick("(3 * n + 3) div 4", "p75_us"),
        pick("(9 * n + 9) div 10", "p90_us"))
      .select(col("key").as(keyCol), col("n").as("n_gaps"),
        expr("s div n").as("mean_us"),
        col("p25_us"), col("p50_us"), col("p75_us"), col("p90_us"))
      .orderBy(keyCol)
  }

  /** Single best mean-shift changepoint per key — binary
    * segmentation's first split, SEARCHED rather than assumed:
    * [[chowTest]] tests a KNOWN breakpoint; this finds the day that
    * minimizes the two-segment residual sum of squares around
    * per-segment means, with the variance-reduction ratio as the
    * "how much did splitting explain" readout ([[cusumReport]] flags
    * one-sided level shifts; this one is two-sided and returns the
    * argmin day directly).
    *
    * Relational search: every candidate split is O(1) from CUMULATIVE
    * sufficient sums (Σy, Σy² as windows over the key's daily census —
    * calendar-bounded stat rows), so the whole scan over candidates is
    * one window pass + one argmin aggregate, never a per-candidate
    * join. RSS cells derive as one closed-form double per candidate
    * from exact DECIMAL sums; the argmin key is the micro-quantized
    * RSS with the day as tiebreak (first-argmin, the house rule).
    *
    * Output per key: (key, n_days, split_after_day, n_left,
    * rss_total, rss_split, var_reduction) — the split falls AFTER
    * split_after_day (no calendar-continuity assumption); keys with
    * < 4 days emit nothing (no valid split leaves ≥ 2 days per side).
    */
  def bestMeanBreak(events: DataFrame, keyCol: String,
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y"))
    val wCum = Window.partitionBy("key").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("key")
    val cums = daily
      .withColumn("i", row_number().over(
        Window.partitionBy("key").orderBy("day")))
      .withColumn("cy", sum(col("y").cast(dec)).over(wCum))
      .withColumn("cyy", sum((col("y").cast(dec) * col("y"))).over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("ty", sum(col("y").cast(dec)).over(wAll))
      .withColumn("tyy", sum((col("y").cast(dec) * col("y"))).over(wAll))
      // candidate split AFTER row i: left = 1..i, right = i+1..n;
      // require >= 2 days per side
      .filter(col("n") >= 4 && col("i") >= 2 && col("i") <= col("n") - 2)
    def d(c: Column) = c.cast("double")
    val nl = d(col("i")); val nr = d(col("n")) - nl
    val rssL = d(col("cyy")) - d(col("cy")) * d(col("cy")) / nl
    val rssR = (d(col("tyy")) - d(col("cyy"))) -
      (d(col("ty")) - d(col("cy"))) * (d(col("ty")) - d(col("cy"))) / nr
    val rssT = d(col("tyy")) - d(col("ty")) * d(col("ty")) / d(col("n"))
    val scored = cums
      .withColumn("rss_split", rssL + rssR)
      .withColumn("rss_total", rssT)
      // argmin key: micro-quantized split RSS, then the EARLIEST day
      .withColumn("__k", struct(
        round(col("rss_split") / 1e6).cast("long").as("rm"),
        col("day").as("day"), col("i").as("i"),
        col("rss_split").as("rs"), col("rss_total").as("rt"),
        col("n").as("n")))
    scored.groupBy(col("key").as(keyCol))
      .agg(min("__k").as("b"))
      .select(col(keyCol), col("b.n").as("n_days"),
        col("b.day").as("split_after_day"),
        col("b.i").cast("long").as("n_left"),
        round(col("b.rt") / 1e12, 6).as("rss_total"),
        round(col("b.rs") / 1e12, 6).as("rss_split"),
        when(col("b.rt") > 0,
          round((col("b.rt") - col("b.rs")) / col("b.rt"), 6))
          .as("var_reduction"))
      .orderBy(keyCol)
  }

  /** Lagged cross-correlation between two keys' daily series — the
    * lead/lag screening question ("do errors follow purchases, and by
    * how many days?") behind any alerting-rule chain: Pearson r of
    * (y_a(t), y_b(t+lag)) at every integer lag in [−maxLag, maxLag],
    * plus the argmax-|r| lag. Correlation ≠ causation; a sharp
    * asymmetric peak is the screening signal.
    *
    * Shape: ONE scan to the cached daily census; the lag fan-out is a
    * (2·maxLag+1)-row literal relation cross-joined onto the a-side
    * (calendar-bounded stat grain), then one date-shifted equi-join
    * and one aggregate per nothing — all lags ride a single grouped
    * aggregate. Sums are exact DECIMAL; r is one closed-form double
    * per lag; the best-lag argmax runs over 2·maxLag+1 stat rows.
    *
    * Output per lag: (lag, n_days, r, best) — r NULL on degenerate
    * variance or < 3 overlapping days; best marks the max-|r| lag
    * (ties → smallest lag), false everywhere if no lag has a defined
    * r.
    */
  def crossCorrelation(events: DataFrame, keyCol: String, keyA: String,
      keyB: String, maxLag: Int, tsCol: String = "ts"): DataFrame = {
    require(maxLag >= 0, "maxLag")
    val dec = "decimal(38,0)"
    val daily = graft.util.Caches.cached(events
      .filter(col(keyCol).isin(keyA, keyB))
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day").agg(count(lit(1)).as("y")))
    val a = daily.filter(col("key") === keyA)
      .select(col("day"), col("y").as("ya"))
    val b = daily.filter(col("key") === keyB)
      .select(col("day").as("day_b"), col("y").as("yb"))
    val lags = (-maxLag to maxLag).map(l => lit(l))
    val fanned = a.select(col("day"), col("ya"),
      explode(array(lags: _*)).as("lag"))
    val s = fanned
      .join(b, expr("day_b = date_add(day, lag)"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_days"),
        sum(col("ya").cast(dec)).as("sx"),
        sum(col("yb").cast(dec)).as("sy"),
        sum(col("ya").cast(dec) * col("ya")).as("sxx"),
        sum(col("yb").cast(dec) * col("yb")).as("syy"),
        sum(col("ya").cast(dec) * col("yb")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n_days")
    val vx = n * d("sxx") - d("sx") * d("sx")
    val vy = n * d("syy") - d("sy") * d("sy")
    val withR = s.select(col("lag"), col("n_days"),
      when(col("n_days") >= 3 && vx > 0 && vy > 0,
        round((n * d("sxy") - d("sx") * d("sy")) / sqrt(vx * vy), 6))
        .as("r"))
    // best-|r| pick over the 2L+1 stat rows (micro-quantized so the
    // comparison is integer, smallest lag on ties)
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
    withR
      .withColumn("__am", max(when(col("r").isNotNull,
        round(abs(col("r")) * 1e6).cast("long"))).over(wAll))
      .withColumn("__bl", min(when(col("r").isNotNull &&
        round(abs(col("r")) * 1e6).cast("long") === col("__am"),
        col("lag"))).over(wAll))
      .select(col("lag"), col("n_days"), col("r"),
        (col("__bl").isNotNull && col("lag") === col("__bl")).as("best"))
      .orderBy("lag")
  }

  /** Chow structural-break test at a KNOWN breakpoint — "did this
    * metric's TREND change after the release": [[Experiment.didReport]]
    * nets out a LEVEL shift; the Chow F asks whether the pre/post
    * daily series need two different regression LINES. F =
    * ((RSSₚ − RSS₁ − RSS₂)/2) / ((RSS₁ + RSS₂)/(n − 4)), RSS from the
    * standard centered sufficient statistics.
    *
    * [[trendReport]]'s integer convention extended with Σy² — per
    * (key, segment): n, Σx, Σy, Σx², Σxy, Σy², all exact DECIMAL(38,0)
    * off ONE scan's daily aggregate; every RSS then derives from those
    * exact integers by ONE closed-form double expression (no row-wise
    * float sums — the cross-engine sum-order hazard never exists).
    * Per-key slopes for both segments ride along for the readout.
    *
    * Output per key: (key, n_pre, n_post, slope_pre, slope_post,
    * f_stat) — slopes micro-per-day at 6 dp; f_stat NULL when a
    * segment has < 3 days or a degenerate x spread; a key active in
    * only one segment drops out entirely (no break to test).
    */
  def chowTest(events: DataFrame, keyCol: String, breakDay: String,
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val dec = "decimal(38,0)"
    // cached daily census: the bounds row, the pooled stats, and both
    // segment stats all read it — one source scan total
    val daily0 = graft.util.Caches.cached(events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"),
        round(col(valCol).cast("double") * 1e6).cast("long").as("vm"))
      .groupBy("key", "day").agg(sum("vm").as("y")))
    val bounds = daily0.agg(min("day").as("day0"))
    val daily = daily0.crossJoin(broadcast(bounds))
      .withColumn("x", datediff(col("day"), col("day0")).cast("long"))
      .withColumn("seg",
        when(col("day") < lit(breakDay).cast("date"), 0).otherwise(1))
    def stats(g: DataFrame, by: Seq[String]) =
      g.groupBy(by.map(col): _*).agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
    // RSS from exact integer sufficient statistics, one double formula
    def rss(p: String) = {
      def c(s: String) = col(p + s).cast("double")
      val n = c("n")
      val sxxC = c("sxx") - c("sx") * c("sx") / n
      val sxyC = c("sxy") - c("sx") * c("sy") / n
      val syyC = c("syy") - c("sy") * c("sy") / n
      (syyC - sxyC * sxyC / sxxC, sxxC, sxyC)
    }
    def seg(i: Int, p: String) = stats(daily.filter(col("seg") === i), Seq("key"))
      .select(col("key") +: Seq("n", "sx", "sy", "sxx", "sxy", "syy")
        .map(s => col(s).as(p + s)): _*)
    val joined = stats(daily, Seq("key"))
      .select(col("key") +: Seq("n", "sx", "sy", "sxx", "sxy", "syy")
        .map(s => col(s).as("p_" + s)): _*)
      .join(seg(0, "a_"), Seq("key"))
      .join(seg(1, "b_"), Seq("key"))
    val (rssP, _, _) = rss("p_")
    val (rssA, sxxA, sxyA) = rss("a_")
    val (rssB, sxxB, sxyB) = rss("b_")
    val nTot = col("a_n") + col("b_n")
    joined.select(
        col("key").as(keyCol),
        col("a_n").cast("long").as("n_pre"),
        col("b_n").cast("long").as("n_post"),
        when(sxxA > 0, round(sxyA / sxxA, 6)).as("slope_pre"),
        when(sxxB > 0, round(sxyB / sxxB, 6)).as("slope_post"),
        when(col("a_n") >= 3 && col("b_n") >= 3 &&
            sxxA > 0 && sxxB > 0 && (rssA + rssB) > 0,
          round(((rssP - rssA - rssB) / 2.0) /
            ((rssA + rssB) / (nTot.cast("double") - 4.0)), 6))
          .as("f_stat"))
      .orderBy(keyCol)
  }
}
