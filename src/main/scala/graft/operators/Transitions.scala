package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over a keyed event stream: for
  * each consecutive pair of states within a key's timeline, the count
  * and row-conditional probability P(to | from) — the user-journey /
  * clickstream summary (where do sessions go after a `view`?), and the
  * input to next-event prediction baselines and anomaly scoring
  * (improbable transitions).
  *
  * Shape: ONE key shuffle for the lag window (deterministic (ts, tie)
  * order), then the pair census is STATE-domain (S² rows at most) — the
  * per-from totals ride a window over those stat rows, never the data.
  * Probability is a single double division rounded at 6 dp
  * (deterministic cross-engine).
  */
object Transitions {

  def transitionMatrix(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val byKey = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("tie").asc)
    val pairs = events
      .select(col(keyCol).as("key"), col(stateCol).as("state"),
        col(tsCol).as("ts"), col(tieCol).as("tie"))
      .withColumn("from_state", lag("state", 1).over(byKey))
      .filter(col("from_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("state").as("to_state"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("__total",
        sum("n").over(Window.partitionBy("from_state")))
      .withColumn("p", round(col("n").cast("double") / col("__total"), 6))
      .select("from_state", "to_state", "n", "p")
      .orderBy("from_state", "to_state")
  }

  /** FOLLOWED-BY census — the gap-tolerant complement of
    * [[transitionMatrix]]: for each ordered state pair (a, b), how
    * many keys ever saw an `a` BEFORE some `b` (any gap, not just
    * adjacent), against the independence baseline. `followed_ppm` is
    * the conditional "given a, b eventually follows"; `lift_ppm`
    * compares that to b's unconditional key-rate — the funnel-
    * discovery signal ("signup → purchase at 3× base rate").
    *
    * Order is the per-key (ts, tie) row rank, so "before" is exact
    * integer position comparison: a precedes b iff min_pos(a) <
    * max_pos(b). One key shuffle for the rank window, then everything
    * is (key, state) stat grain — the pair fan-out is K² per key,
    * bounded by the state vocabulary.
    *
    * Output per pair (a ≠ b, both present somewhere): (type_a, type_b,
    * n_keys, n_a, n_b, n_ab, followed_ppm, lift_ppm), pair-ordered.
    */
  def followedByCensus(events: DataFrame, keyCol: String = "user_id",
      stateCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val byKey = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("tie").asc)
    val pos = events
      .select(col(keyCol).as("key"), col(stateCol).as("state"),
        col(tsCol).as("ts"), col(tieCol).as("tie"))
      .withColumn("pos", row_number().over(byKey))
    val per = graft.util.Caches.cached(pos.groupBy("key", "state")
      .agg(min("pos").as("first_pos"), max("pos").as("last_pos")))
    val nKeys = per.agg(count_distinct(col("key")).as("n_keys"))
    val totals = per.groupBy("state")
      .agg(count(lit(1)).as("n_with"))
    val pairs = per.as("a").join(per.as("b"),
        col("a.key") === col("b.key") &&
        col("a.state") =!= col("b.state"))
      .groupBy(col("a.state").as("type_a"), col("b.state").as("type_b"))
      .agg(sum(when(col("a.first_pos") < col("b.last_pos"), 1L)
        .otherwise(0L)).as("n_ab"))
    pairs
      .join(totals.select(col("state").as("type_a"),
        col("n_with").as("n_a")), Seq("type_a"))
      .join(totals.select(col("state").as("type_b"),
        col("n_with").as("n_b")), Seq("type_b"))
      .crossJoin(broadcast(nKeys))
      .select(col("type_a"), col("type_b"), col("n_keys"),
        col("n_a"), col("n_b"), col("n_ab"),
        expr("(n_ab * 1000000) div n_a").as("followed_ppm"),
        // DECIMAL: n_ab·n_keys·10⁶ overflows long at 10⁹ keys
        expr("cast((cast(n_ab as decimal(38,0)) * n_keys * 1000000) " +
          "div (cast(n_a as decimal(38,0)) * n_b) as bigint)")
          .as("lift_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** Gapped SEQUENTIAL-TRIPLE census — the length-3 sequential-pattern
    * miner (the PrefixSpan-family question at fixed depth): for each
    * ordered triple of DISTINCT states (a, b, c), how many keys
    * contain it as a SUBSEQUENCE (any gaps). The witness reduction
    * keeps everything off raw position triples: (a,b,c) ⊆ key ⇔
    * `earliest b after the key's first a` < `the key's last c` —
    * sufficient statistics per (key, state) and (key, a, b), never an
    * O(n³) per-key enumeration.
    *
    * Shape: one key shuffle for the rank window; the fab relation is
    * an event-grain × |vocab| fan-out (each position meets each
    * a-state of its key); the triple join is (key × vocab²) × vocab
    * stat grain. Both are vocabulary-bounded — document the cap when
    * states are high-cardinality.
    *
    * Output: (type_a, type_b, type_c, support) — top `topN` by
    * (support desc, triple asc).
    */
  def sequentialTriples(events: DataFrame, topN: Int,
      keyCol: String = "user_id", stateCol: String = "event_type",
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    require(topN >= 1, "topN")
    val byKey = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("tie").asc)
    val posC = graft.util.Caches.cached(events
      .select(col(keyCol).as("key"), col(stateCol).as("state"),
        col(tsCol).as("ts"), col(tieCol).as("tie"))
      .withColumn("pos", row_number().over(byKey))
      .select("key", "state", "pos"))
    val stats = graft.util.Caches.cached(posC.groupBy("key", "state")
      .agg(min("pos").as("fp"), max("pos").as("lp")))
    val fab = stats.select(col("key"), col("state").as("a"), col("fp"))
      .join(posC.select(col("key"), col("state").as("b"), col("pos")),
        Seq("key"))
      .filter(col("pos") > col("fp") && col("a") =!= col("b"))
      .groupBy("key", "a", "b").agg(min("pos").as("fab"))
    fab
      .join(stats.select(col("key"), col("state").as("c"), col("lp")),
        Seq("key"))
      .filter(col("c") =!= col("a") && col("c") =!= col("b") &&
        col("fab") < col("lp"))
      .groupBy(col("a").as("type_a"), col("b").as("type_b"),
        col("c").as("type_c"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("type_a").asc,
        col("type_b").asc, col("type_c").asc)
      .limit(topN)
  }

  /** Markov-chain REMOVAL-EFFECT attribution (public method: Anderl,
    * Becker, von Wangenheim & Schumann 2014's "Mapping the customer
    * journey" framework): journeys are each key's state sequence
    * truncated at its FIRST `convState` event (`~start` → e₁ → … →
    * `~conv`, or → `~null` when the key never converts); a channel's
    * credit is how much the chain's absorption probability into
    * `~conv` drops when that channel's node is removed (its incoming
    * transitions redirect to `~null` — paths through it fail).
    *
    * Absorption runs a FIXED number of value-iteration steps so the
    * whole recursion unrolls to SQL: v₀ = 10⁶ at `~conv`, vₜ₊₁(i) =
    * (Σⱼ p(i→j)·vₜ(j)) div 10⁶ with the absorbing states pinned —
    * every quantity an exact non-negative integer in micro, every
    * division a floor, so partial-agg order can't move a bit.
    *
    * Scale shape: ONE key shuffle builds the journey pairs (the
    * [[transitionMatrix]] lag window); everything after is
    * STATE-domain — the (K+1)-variant matrix (full + one per removed
    * channel) is ≤ (K+1)·(K+2)² stat rows and ALL variants propagate
    * together through `steps` joins, no per-channel loop and no
    * collect.
    *
    * Output per channel: (channel, p_conv_full_micro,
    * p_conv_removed_micro, removal_effect_ppm, share_ppm),
    * channel-ordered.
    */
  def removalEffect(events: DataFrame, convState: String,
      steps: Int = 6, keyCol: String = "user_id",
      stateCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    require(steps >= 1, "steps")
    val Start = "~start"; val Conv = "~conv"; val Nul = "~null"
    val ev = events.select(col(keyCol).as("u"), col(stateCol).as("s"),
      col(tsCol).as("ts"), col(tieCol).as("tie"))
    val byU = Window.partitionBy("u")
      .orderBy(col("ts").asc, col("tie").asc)
    val conv = ev.filter(col("s") === convState)
      .withColumn("rn", row_number().over(byU))
      .filter(col("rn") === 1)
      .select(col("u"), col("ts").as("cts"), col("tie").as("ctie"))
    val j = graft.util.Caches.cached(ev
      .join(conv, Seq("u"), "left")
      .filter(col("cts").isNull || col("ts") < col("cts") ||
        (col("ts") === col("cts") && col("tie") < col("ctie")))
      .withColumn("rn", row_number().over(byU))
      .withColumn("nmax", count(lit(1)).over(Window.partitionBy("u")))
      .withColumn("prev", lag("s", 1).over(byU)))
    val internal = j.filter(col("rn") >= 2)
      .select(col("prev").as("f"), col("s").as("t"))
    val starts = j.filter(col("rn") === 1)
      .select(lit(Start).as("f"), col("s").as("t"))
    val terminals = j.filter(col("rn") === col("nmax"))
      .select(col("s").as("f"),
        when(col("cts").isNotNull, Conv).otherwise(Nul).as("t"))
    // keys whose FIRST event converts have an empty journey: ~start→~conv
    val instant = conv.join(j.select("u").distinct(), Seq("u"), "left_anti")
      .select(lit(Start).as("f"), lit(Conv).as("t"))
    val m = internal.unionByName(starts).unionByName(terminals)
      .unionByName(instant)
      .groupBy("f", "t").agg(count(lit(1)).as("n"))
      .withColumn("tot", sum("n").over(Window.partitionBy("f")))
      .select(col("f"), col("t"), expr("(n * 1000000) div tot").as("p"))
    // The transition matrix is a ≤ (K+2)² STAT relation — collect it
    // (the house K-row allowance) and run the (K+1)-variant value
    // iteration in exact long arithmetic on the driver: ~250 rows ×
    // `steps` multiplications beat the ~20 tiny shuffle stages the
    // distributed loop paid in pure scheduling overhead (31 s → <1 s
    // at sf0.1, bit-identical output — the same truncating integer
    // ops the SQL oracle unrolls).
    val mat = graft.util.Guards.countedCollect(m, "removalEffect")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val channels = mat.map(_._1).filter(_ != Start).distinct.sorted
    def absorb(variant: Option[String]): Long = {
      val edges0 = variant match {
        case None => mat
        case Some(c) => mat.collect {
          case (f, t, p) if f != c =>
            (f, if (t == c) Nul else t, p)
        }
      }
      val edges = edges0.groupBy(e => (e._1, e._2))
        .map { case ((f, t), es) => (f, t, es.map(_._3).sum) }.toSeq
      val states = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var v: Map[String, Long] =
        states.map(s => s -> (if (s == Conv) 1000000L else 0L)).toMap
      val bySrc = edges.groupBy(_._1)
      for (_ <- 1 to steps) {
        val nxt = bySrc.map { case (f, es) =>
          f -> Math.floorDiv(
            es.map { case (_, t, p) => p * v.getOrElse(t, 0L) }.sum,
            1000000L)
        }
        v = states.map { s =>
          s -> (if (s == Conv) 1000000L else if (s == Nul) 0L
            else nxt.getOrElse(s, 0L))
        }.toMap
      }
      v.getOrElse(Start, 0L)
    }
    val pfull = absorb(None)
    val per = channels.map(c => (c, pfull - absorb(Some(c))))
    val rtot = per.map(_._2).sum
    val spark = events.sparkSession
    import spark.implicits._
    per.toSeq.map { case (c, rem) =>
      (c, pfull, pfull - rem,
        if (pfull > 0) Some((rem * 1000000L) / pfull) else None,
        if (rtot > 0) Some((rem * 1000000L) / rtot) else None)
    }.toDF("channel", "p_conv_full_micro", "p_conv_removed_micro",
        "removal_effect_ppm", "share_ppm")
      .orderBy("channel")
  }
}
