package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket association rules: for item pairs that co-occur in at
  * least `minSupport` baskets, both directed rules a→b and b→a with
  * support / confidence / lift — the classic "customers who bought X
  * also bought Y" miner, and for corpus work the "docs tagged X also
  * carry Y" co-tag analyzer.
  *
  * Extends the reference's per-column frequency tracking (histograms per
  * run) to second-order structure the same way
  * [[Collocations.pmiTop]] does for token bigrams — but over BASKETS
  * (group/item), with the Apriori guarantees:
  *
  *  - **Downward closure prune**: an item below `minSupport` cannot
  *    appear in any rule, so items are pruned BEFORE the pair
  *    self-join — the candidate-generation step never sees them. The
  *    prune is a semi-join against the item-count relation (no
  *    broadcast assumption: item vocabularies at 100 TB exceed driver
  *    memory; the semi-join shuffles by item key).
  *  - **Basket cap** (`maxGroupSize`, the [[Graph.coOccurrenceEdges]] /
  *    jaccardPairs hot-set pattern): a basket with B items fans B²/2
  *    pairs, so one degenerate mega-basket quadratically dominates the
  *    join. Capped baskets are dropped whole via an anti-join on the
  *    (few) hot group ids, and `n_baskets` counts the SURVIVING baskets
  *    so support/lift denominators stay consistent with the pair stage.
  *
  * Exact arithmetic: supp/conf are integer PPM via `div` (floor) —
  * `n_both·10⁶` stays in Long through ~9·10¹² baskets. Lift is the one
  * double, derived from the four exact counts identically in the SQL
  * oracle: lift = n_both·N/(n_ante·n_cons), > 1 ⇔ positive association.
  *
  * Scale shape: one scan to the distinct (group, item) relation
  * (cached — it feeds the hot-group census, the item census, and the
  * pair join), one group-keyed self-join whose per-key fan-out is
  * bounded by the cap, then stat-sized joins (the rule relation is
  * ≤ pairs·2 rows). No windows, no corpus-scale broadcast.
  *
  * Output: (antecedent, consequent, n_baskets, n_ante, n_cons, n_both,
  * supp_ppm, conf_ppm, lift), ordered (antecedent, consequent).
  */
object AssociationRules {

  def rules(baskets: DataFrame, groupCol: String, itemCol: String,
      minSupport: Long, maxGroupSize: Option[Long] = None): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val base0 = baskets
      .select(col(groupCol).as("g"), col(itemCol).as("it"))
      .distinct()
    val base = graft.util.Caches.cached(maxGroupSize match {
      case Some(cap) =>
        val hot = base0.groupBy("g").agg(count(lit(1)).as("sz"))
          .filter(col("sz") > cap).select("g")
        base0.join(broadcast(hot), Seq("g"), "left_anti")
      case None => base0
    })
    val nBaskets = base.select("g").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = graft.util.Caches.cached(
      base.groupBy("it").agg(count(lit(1)).as("n_it")))
    val freqItems = itemCounts.filter(col("n_it") >= minSupport)
    val pruned = base.join(freqItems.select("it"), Seq("it"), "left_semi")
    val pairs = pruned.as("a")
      .join(pruned.as("b"),
        col("a.g") === col("b.g") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("it_a"), col("b.it").as("it_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    // explode, not union: the union shape executes the basket self-join
    // + pair aggregation once per branch (round-14, the
    // Graph.bothDirections rationale)
    val directed = pairs
      .select(explode(array(
        struct(col("it_a").as("antecedent"), col("it_b").as("consequent"),
          col("n_both")),
        struct(col("it_b").as("antecedent"), col("it_a").as("consequent"),
          col("n_both")))).as("e"))
      .select(col("e.*"))
    directed
      .join(itemCounts.withColumnRenamed("it", "antecedent")
        .withColumnRenamed("n_it", "n_ante"), Seq("antecedent"))
      .join(itemCounts.withColumnRenamed("it", "consequent")
        .withColumnRenamed("n_it", "n_cons"), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_baskets"),
        col("n_ante"), col("n_cons"), col("n_both"),
        expr("(n_both * 1000000L) div n_baskets").as("supp_ppm"),
        expr("(n_both * 1000000L) div n_ante").as("conf_ppm"),
        round(col("n_both").cast("double") * col("n_baskets") /
          (col("n_ante").cast("double") * col("n_cons")), 6).as("lift"))
      .orderBy("antecedent", "consequent")
  }
}
