package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph analytics over relation-derived graphs.
  *
  * Training-data curation grows graph-shaped subproblems everywhere the
  * moment dedup/similarity evidence exists: near-dup pairs form a graph
  * (components = dup clusters, q50), co-occurrence relations form a graph
  * (items sharing an order / documents sharing a domain), and importance
  * propagation over such graphs (PageRank) is the classic way to turn
  * local link evidence into a global quality/centrality score — the same
  * shape web-crawl curation pipelines use to pick which pages to keep.
  * Triangle counting / clustering coefficients are the standard local
  * density diagnostic (boilerplate families and template farms show up as
  * abnormally dense neighborhoods).
  *
  * Everything here works on an EDGE RELATION, never an adjacency matrix:
  *  - [[coOccurrenceEdges]] derives undirected edges from a (group, item)
  *    relation with the house stop-key skew cap (a hot group of size g
  *    fans out g²/2 pairs — the q97a/q61a hazard in graph clothing).
  *  - [[pageRankMicro]] is rank propagation as a per-iteration
  *    (join on src → sum by dst) — one key shuffle per round, label
  *    relation localCheckpoint'd like [[Dedup.connectedComponents]], in
  *    integer MICRO-rank arithmetic so results are combine-order-free and
  *    hash-exact cross-engine (floor division only: contributions
  *    `rank div deg`, update `150000 + (85·Σ) div 100` ≡ the damping-0.85
  *    update with per-node unit mass 10⁶).
  *  - [[triangleReport]] uses the degree-ordered orientation (each edge
  *    directed from its (degree, id)-smaller endpoint), which bounds every
  *    node's out-degree by O(√m) on any graph — the compact-forward bound
  *    that keeps the wedge join from exploding on hubs.
  */
object Graph {

  /** Both orientations of an undirected edge relation from ONE upstream
    * execution: `explode(array(fwd, rev))` instead of
    * `e.unionByName(e.flipped)`. The union shape plans the ENTIRE
    * upstream derivation once per branch — runtime exchange reuse
    * recovers the shared stages, but the un-reused tail (final
    * aggregate, projections) still executes twice, and every downstream
    * stage sees the union's 2×N partitions (64 tasks at the house
    * default instead of 32, pure scheduling overhead at any scale). The
    * explode derives both directions in one pass of one subtree and
    * keeps the input's partition count. Round-14 measured on the
    * co-purchase graph: the derivation stages halve, walls in
    * OPTIMIZATION_r14.md.
    *
    * `weight`: optional per-edge weight column riding both directions.
    */
  private def bothDirections(edges: DataFrame, aCol: String, bCol: String,
      weight: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val fwd = weight match {
      case Some(w) => struct(col(aCol).as("src"), col(bCol).as("dst"), w.as("w"))
      case None => struct(col(aCol).as("src"), col(bCol).as("dst"))
    }
    val rev = weight match {
      case Some(w) => struct(col(bCol).as("src"), col(aCol).as("dst"), w.as("w"))
      case None => struct(col(bCol).as("src"), col(aCol).as("dst"))
    }
    edges.select(explode(array(fwd, rev)).as("e")).select(col("e.*"))
  }

  /** Undirected co-occurrence edges from a (group, item) relation:
    * distinct item pairs (a < b) sharing a group, weighted by the number
    * of shared groups.
    *
    * `maxGroupSize` is the stop-key cap: groups with more than `cap`
    * distinct items are dropped BEFORE pairing (hot-set anti-join, the
    * jaccardPairs pattern — a 10⁴-item group would contribute 5·10⁷ pair
    * rows while signalling almost nothing pairwise-specific).
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Option[Long] = None): DataFrame = {
    val gi = df.select(col(groupCol).as("g"), col(itemCol).as("it")).distinct()
    val base = maxGroupSize match {
      case Some(cap) =>
        val hot = gi.groupBy("g").agg(count(lit(1)).as("n"))
          .filter(col("n") > cap).select("g")
        gi.join(broadcast(hot), Seq("g"), "left_anti")
      case None => gi
    }
    val a = base.select(col("g"), col("it").as("node_a"))
    val b = base.select(col("g"), col("it").as("node_b"))
    a.join(b, Seq("g"))
      .filter(col("node_a") < col("node_b"))
      .groupBy("node_a", "node_b")
      .agg(count(lit(1)).as("n_groups"))
  }

  /** PageRank in integer micro-rank arithmetic over an undirected edge
    * relation (node_a, node_b), distinct pairs.
    *
    * Per-node unit mass is 10⁶; each iteration every node sends
    * `rank_micro div degree` along each incident edge and updates to
    * `150000 + (85 · Σ incoming) div 100` — the damping-0.85 update with
    * (1−d)·10⁶ = 150000. All arithmetic is non-negative integer floor
    * division, so partial-aggregation order cannot perturb the result
    * (the q123 micro-integer convention) and a fixed iteration count is
    * exactly reproducible in unrolled SQL.
    *
    * Shape: the degree-annotated directed edge relation is computed once
    * and cached; each round is ONE join (ranks are node-keyed, edges
    * src-keyed — co-partitioned after round 1) + ONE dst-keyed sum.
    * Ranks stay distributed across rounds: localCheckpoint truncates
    * lineage executor-side (the connectedComponents pattern), so node
    * count is unbounded by driver memory.
    */
  /** [[pageRankMicro]] with unit edge weights. */
  def pageRankMicro(edges: DataFrame, iterations: Int,
      aCol: String = "node_a", bCol: String = "node_b"): DataFrame =
    pageRankMicro(edges, iterations, aCol, bCol, None)

  /** k-core membership after `rounds` peels — "the graph's resilient
    * backbone": repeatedly delete nodes of degree < k (edges incident
    * to deleted nodes go with them) and report who survives. A node's
    * coreness gates between hub quality and noisy periphery in
    * recommendation/contamination graphs. Peeling provably converges
    * in ≤ |V| rounds but in practice a handful; callers pass a fixed
    * `rounds` (the pageRank/BPE unroll convention — SQL-exact) and
    * [[Graph]] specs pin that the fixture reaches its fixpoint (round
    * R ≡ R+1).
    *
    * Each round: degree census of the SURVIVING edge relation (one
    * aggregate), semi-join edges against surviving nodes (no
    * broadcast assumption on the vocabulary), localCheckpoint so round
    * r's plan never replays rounds 1..r−1.
    *
    * Output per ORIGINAL node: (node, degree0, survives, final_degree)
    * — degree0 the starting degree, final_degree NULL for peeled
    * nodes, node-ordered.
    */
  def kCoreReport(edges: DataFrame, k: Long, rounds: Int,
      aCol: String = "node_a", bCol: String = "node_b"): DataFrame = {
    require(k >= 1 && rounds >= 1, "k/rounds")
    // ONE cached src-partitioned relation feeds the starting-degree
    // census AND round 1 (round-14: the union shape filled deg0 and
    // live from two separate upstream executions — the whole edge
    // derivation ran twice per call)
    val directed0 = graft.util.Caches.cached(
      bothDirections(edges, aCol, bCol).repartition(col("src")))
    val deg0 = graft.util.Caches.cached(
      directed0.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree0")))
    // ALTERNATING-ORIENTATION peeling over CACHED rounds: live is
    // symmetric by construction (both directions present) and stays
    // symmetric — a pair survives iff BOTH endpoints pass — so
    // degree-by-src ≡ degree-by-dst on it. Each round aggregates and
    // keep-joins on the key its input is already partitioned by, and
    // the ONE full-relation shuffle (the other endpoint's semi-join)
    // leaves the output partitioned by THAT key — which is exactly
    // next round's census key. The moving parts, each measured:
    //  - live is CACHED, not localCheckpoint'ed: a checkpoint's
    //    LogicalRDD reports UnknownPartitioning under AQE, so the
    //    layout would die at every round boundary; the cache preserves
    //    it and AQE elides the aligned exchanges at runtime once the
    //    TableCacheQueryStage materializes. Unpersisting the previous
    //    round caps peak storage at ~2 live copies.
    //  - keep (NODE-grain, small) IS localCheckpoint'ed: each round
    //    references live three times (join input + twice via keep), so
    //    an uncheckpointed chain grows the logical plan 3^rounds — a
    //    2 GB plan string by round 8. Truncating keep makes growth
    //    linear while losing only a node-grain relation's lineage.
    //  - the checkpoint also erases keep's SIZE estimate (a leaf
    //    defaults to "huge"), which would force sort-merge plans even
    //    when keep is tiny — so the operator re-adds the broadcast
    //    decision itself from keep's actual (free, post-checkpoint)
    //    count against the session's own autoBroadcastJoinThreshold;
    //    at 100 TB node-grain keep exceeds the threshold and the
    //    sort-merge path with its single full-relation exchange per
    //    round is the right plan. Round8aSpec gates the per-round
    //    shuffle-byte budget against the shuffle-both-ends shape.
    val spark = edges.sparkSession
    val thrRaw = spark.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val bcThreshold = try thrRaw.toLong catch {
      case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thrRaw)
    }
    var live = directed0
    var key = "src"
    var first = true
    for (_ <- 1 to rounds) {
      val other = if (key == "src") "dst" else "src"
      // round 1's degree census IS deg0 — reuse it (one aggregate saved,
      // and the checkpoint action fills the deg0 cache before directed0
      // is unpersisted at the round boundary)
      val census =
        if (first) deg0.select(col("node").as(key), col("degree0").as("d"))
        else live.groupBy(key).agg(count(lit(1)).as("d"))
      first = false
      val keepCp = census.filter(col("d") >= k).select(key)
        .localCheckpoint()
      val small = bcThreshold > 0 && keepCp.count() * 32L < bcThreshold
      val keep = if (small) broadcast(keepCp) else keepCp
      val next = graft.util.Caches.cached(
        live.join(keep, Seq(key))
          .join(keep.withColumnRenamed(key, other), Seq(other)))
      next.count() // materialize BEFORE dropping the input cache
      live.unpersist(blocking = false)
      live = next
      key = other
    }
    val fin = live.groupBy(col(key).as("node"))
      .agg(count(lit(1)).as("final_degree"))
    deg0.join(fin, Seq("node"), "left")
      .select(col("node"), col("degree0"),
        col("final_degree").isNotNull.as("survives"), col("final_degree"))
      .orderBy("node")
  }

  /** ADAMIC–ADAR link prediction (public method: Adamic & Adar 2003;
    * the Liben-Nowell & Kleinberg 2007 link-prediction benchmark's
    * strongest simple baseline): for every NON-adjacent node pair
    * sharing ≥ 1 neighbor, score Σ_z 1/ln(deg z) over the common
    * neighbors z — rare shared neighbors say more than hubs. The
    * top-k candidate pairs are the "edges most likely missing"
    * (recommendation / knowledge-graph completion signal).
    *
    * Exactness: each wedge center contributes the INTEGER
    * `round(10⁶/ln(deg_z))` (deg_z ≥ 2 for any wedge center, so
    * ln > 0), summed exactly; top-k under (score desc, pair asc) is a
    * TakeOrdered, never a global sort. Scale: the wedge fan-out is
    * deg² per center — `maxWedgeDegree` drops hub centers above the
    * cap (the coOccurrenceEdges stop-key pattern; a 10⁴-degree hub
    * contributes 5·10⁷ wedges and ~0 score each), and the
    * already-adjacent filter is an anti-join on the edge relation.
    *
    * Output: (node_a, node_b, n_common, aa_score_micro), top `k`
    * pairs, (score desc, node_a, node_b) ordered.
    *
    * SCALING TIER (round-13): the UNCAPPED call is the ORACLE tier —
    * exact over every wedge, Σ C(deg, 2) rows, inherently pair-grain:
    * on a densifying graph that count grows superlinearly in edges and
    * no degree split can change it (every wedge contributes to some
    * pair's sum, and a pair's wedges scatter across center-keyed
    * partitions, so there is nothing to combine map-side and nothing
    * to broadcast away — round-13 measured the addressable costs and
    * took them: the pair key stays PACKED through the already-adjacent
    * anti-join, whose edge side broadcasts off a Σdeg stat read, and
    * the wedge contribution shuffles as an INT; ~35% off wall at
    * sf0.1). PRODUCTION is the `maxWedgeDegree`-capped call (q233a):
    * hub centers drop BEFORE the deg² fan-out, which bounds per-center
    * work and is the documented semantic trade for corpus-scale graphs.
    */
  def adamicAdarTopK(edges: DataFrame, k: Int,
      maxWedgeDegree: Option[Long] = None,
      aCol: String = "node_a", bCol: String = "node_b"): DataFrame = {
    require(k >= 1, "k")
    // cached: the edge relation feeds the wedge fan-out AND the
    // already-adjacent anti-join — uncached it re-derives upstream
    // (2 extra source scans, tree-probed)
    val e0 = graft.util.Caches.cached(
      edges.select(col(aCol).as("na"), col(bCol).as("nb")))
    // explode, not union: one cache read and half the downstream
    // partition count (the union shape scans the cache once per branch)
    val directed = bothDirections(e0, "na", "nb")
      .select(col("src").as("na"), col("dst").as("nb"))
    val deg = graft.util.Caches.cached(
      directed.groupBy(col("na").as("z")).agg(count(lit(1)).as("deg")))
    // deg >= 2: a degree-1 node centers no wedge, and its ln(1) = 0
    // contribution would divide by zero on either engine
    val centers = (maxWedgeDegree match {
      case Some(cap) => deg.filter(col("deg") <= cap)
      case None => deg
    }).filter(col("deg") >= 2)
    val contrib = centers
      .select(col("z"),
        round(lit(1e6) / log(col("deg").cast("double"))).cast("long")
          .as("c"))
    // restrict the adjacency to surviving centers BEFORE the deg²
    // fan-out — hub rows must never reach the self-join
    val adj = directed.select(col("na").as("z"), col("nb").as("n"))
      .join(contrib, Seq("z"))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .select(col("x.z").as("z"), col("x.n").as("node_a"),
        col("y.n").as("node_b"), col("x.c").as("c"))
    // the wedge relation is the operator's bulk (Σ deg² rows — 142M
    // on the sf0.1 co-purchase graph); when node ids fit 32 bits,
    // pack the pair into ONE long key so the grouping shuffles half
    // the key bytes (a 1-row stat read decides; ids ≥ 2³¹ take the
    // two-column path, same result)
    // one stat read off the cached degree census decides the key packing
    // AND sizes the pair shuffle: id bounds + the exact wedge count
    // Σ C(deg,2) over surviving centers
    val capFilter = maxWedgeDegree
      .map(cap => col("deg") <= cap).getOrElse(lit(true))
    val stats = deg.agg(max(col("z")).cast("long"),
      min(col("z")).cast("long"),
      sum(when(col("deg") >= 2 && capFilter,
        expr("deg * (deg - 1) div 2")).otherwise(0L)).cast("long"),
      sum(col("deg")).cast("long"))
      .collect()(0)
    // a negative node_b would sign-corrupt shiftleft(a,32)+b and merge
    // distinct pairs — both bounds must sit in [0, 2³¹)
    val packable = !stats.isNullAt(0) &&
      stats.getLong(0) < (1L << 31) && stats.getLong(1) >= 0
    val wedgeRows = if (stats.isNullAt(2)) 0L else stats.getLong(2)
    // Σdeg = 2E sizes the already-adjacent anti-join's right side. The
    // gate budgets the IN-MEMORY broadcast footprint, not raw key
    // bytes: a LongHashedRelation carries ~40 B/entry (8 B key + map
    // slot + UnsafeRow), so gating on 8 B/key would admit graphs whose
    // built relation is ~5x the nominal cap (round-13 ADVICE). At
    // ~40 B/entry a 64 MB footprint admits up to ~1.7M distinct edges
    // (~13 MB raw keys — inside the advised 8-16 MB raw band); Σdeg/2
    // also counts duplicate input edges, which only OVERestimates and
    // therefore only ever disables the broadcast, never admits an
    // oversized one. Bigger graphs fall back to the shuffle anti-join
    // automatically.
    val edgeCount = if (stats.isNullAt(3)) 0L else stats.getLong(3) / 2L
    val broadcastEdges = packable && edgeCount * 40L < 64L * 1024 * 1024
    // the pair groupBy is the operator's memory cliff: at the default
    // 32 shuffle partitions, 142M sf0.1 wedges put ~4.4M pairs per
    // reducer hash map and the partial-agg fallback spills tens of GB.
    // An explicit repartition by the pair key sizes that stage to
    // ~2M rows/task (AQE leaves user-numbered repartitions alone) —
    // the map-side partial agg it forgoes was combining almost nothing
    // (a pair repeats only across wedge CENTERS, which the z-partitioned
    // join output scatters), while its oversized hash maps were the
    // spill source.
    val pairParts = math.min(1024L, math.max(
      edges.sparkSession.sparkContext.defaultParallelism.toLong,
      wedgeRows / 2000000L + 1)).toInt
    val cand =
      if (packable) {
        // the anti-join runs ON the packed key, BEFORE unpacking: the
        // edge set packs to canonical least/greatest (edges may arrive
        // in either orientation), and when it fits the broadcast cap
        // the candidate bulk never shuffles a second time. The wedge
        // contribution c ≤ 10⁶/ln 2 < 2³¹ rides the shuffle as an INT
        // (25% fewer bytes on the operator's dominant exchange);
        // sum(int) widens back to long, values unchanged.
        val packedEdges = e0.select(
          (shiftleft(least(col("na"), col("nb")), 32) +
            greatest(col("na"), col("nb"))).as("pk")).distinct()
        val anti = if (broadcastEdges) broadcast(packedEdges) else packedEdges
        wedges
          .select((shiftleft(col("node_a"), 32) + col("node_b"))
            .as("pk"), col("c").cast("int").as("c"))
          .repartition(pairParts, col("pk"))
          .groupBy("pk")
          .agg(count(lit(1)).as("n_common"),
            sum("c").as("aa_score_micro"))
          .join(anti, Seq("pk"), "left_anti")
          .select(shiftright(col("pk"), 32).as("node_a"),
            (col("pk") bitwiseAND lit(0xffffffffL)).as("node_b"),
            col("n_common"), col("aa_score_micro"))
      } else
        wedges.repartition(pairParts, col("node_a"), col("node_b"))
          .groupBy("node_a", "node_b")
          .agg(count(lit(1)).as("n_common"),
            sum("c").as("aa_score_micro"))
          // drop pairs that are ALREADY edges (canonical a < b)
          .join(e0.select(col("na").as("node_a"), col("nb").as("node_b"))
            .unionByName(e0.select(col("nb").as("node_a"),
              col("na").as("node_b")))
            .distinct(), Seq("node_a", "node_b"), "left_anti")
    cand.orderBy(col("aa_score_micro").desc, col("node_a").asc,
        col("node_b").asc)
      .limit(k)
  }

  /** SYNCHRONOUS label-propagation communities (public method:
    * Raghavan, Albert & Kumara 2007's LPA, in its deterministic
    * synchronous form): every node starts as its own label; each round
    * every node adopts its neighbors' MOST FREQUENT label, ties to the
    * smallest label — the (count desc, label asc) total order makes a
    * fixed round count exactly reproducible in unrolled SQL, where the
    * paper's random asynchronous order could not be oracled.
    *
    * Shape: one cached src-partitioned directed relation; each round
    * is ONE join (labels are node-keyed) + one (node, label) vote
    * census + a min_by argmax — no corpus windows, labels
    * localCheckpoint'd at node grain. Isolated nodes cannot exist
    * (nodes derive from the edge relation).
    *
    * Output per node: (node, community, community_size), node-ordered.
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
      aCol: String = "node_a", bCol: String = "node_b"): DataFrame = {
    require(rounds >= 1, "rounds")
    // UNION shape here, not bothDirections' explode (round-15, q228):
    // this fill has exactly ONE cached consumer and no shared census,
    // so derive-once buys nothing — runtime exchange reuse already
    // recovers the duplicated upstream shuffle stages — while the
    // explode halves the fill's map parallelism (it keeps the input's
    // partition count; the union's two branches schedule as 2× tasks).
    // Round-14 A/B'd the explode at +10–17% on this operator; reverted.
    val directed = edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    val ed = graft.util.Caches.cached(directed.repartition(col("src")))
    var labels = ed.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = ed
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      labels = votes.groupBy("node")
        .agg(min_by(col("lbl"), struct(-col("c"), col("lbl"))).as("lbl"))
        .localCheckpoint()
    }
    val sizes = labels.groupBy("lbl")
      .agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("lbl"))
      .select(col("node"), col("lbl").as("community"),
        col("community_size"))
      .orderBy("node")
  }

  /** Weighted variant: each node splits its rank over incident edges
    * PROPORTIONALLY to `weightCol` (floor division `rank·w div
    * strength`, strength = Σ incident weights — still all non-negative
    * integer arithmetic, so unrolled-SQL-exact). With `None`, every
    * edge weighs 1 and `degree` is the classic degree.
    */
  def pageRankMicro(edges: DataFrame, iterations: Int,
      aCol: String, bCol: String, weightCol: Option[String]): DataFrame = {
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    // ONE cached both-directions relation feeds the degree census AND
    // the degree-annotated edge cache (round-14: the two union-shaped
    // consumers each re-executed the full upstream edge derivation —
    // deg fill and ed fill were two complete co-occurrence runs)
    val directed = graft.util.Caches.cached(
      bothDirections(edges, aCol, bCol, Some(w)))
    // deg is node-hash-partitioned by its groupBy and CACHED: the rank
    // update and the final report re-enter it without re-aggregating
    // the edge relation
    val deg = graft.util.Caches.cached(
      directed.groupBy(col("src").as("node"))
        .agg(sum("w").as("degree")))
    // the degree-annotated edges cache SRC-HASH-PARTITIONED: each
    // round's rank join then reuses this layout (ranks arrive node-
    // partitioned from their own aggregate), so the per-round shuffle
    // is ONLY the dst-keyed message aggregation — the edge relation
    // crosses the wire once at cache fill, not once per round
    val ed = graft.util.Caches.cached(
      directed.join(deg.withColumnRenamed("node", "src"), Seq("src"))
        .repartition(col("src")))
    var ranks = deg.select(col("node"), lit(1000000L).as("rank_micro"))
      .localCheckpoint()
    var round = 0
    while (round < iterations) {
      val incoming = ed.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("(rank_micro * w) div degree").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("s"))
      ranks = deg.select("node")
        .join(incoming, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank_micro"))
        .localCheckpoint()
      // round 1's checkpoint materialized ed (and deg before it) —
      // directed has no further consumer, so drop it now instead of at
      // Caches.releaseAll: holding BOTH edge copies doubles the
      // storage-memory footprint for the rest of the walk (ADVICE r14)
      if (round == 0) directed.unpersist(blocking = false)
      round += 1
    }
    deg.join(ranks, Seq("node"))
      .select("node", "degree", "rank_micro")
      .orderBy("node")
  }

  /** Per-node triangle census + local clustering coefficient over an
    * undirected edge relation (node_a, node_b), distinct pairs.
    *
    * Edges are oriented from their (degree, id)-smaller endpoint before
    * the wedge join — the compact-forward orientation, which bounds every
    * out-neighborhood by O(√m) regardless of hub degree, so the wedge
    * intermediate is Σ outdeg² = O(m^1.5) worst-case instead of Σ deg²
    * (hub-quadratic). Each triangle materializes exactly once (a→b→c with
    * a→c), then fans back to its three corners through a 3-row explode of
    * a triangle-relation-sized input.
    *
    * Output: (node, degree, n_triangles, clustering) — clustering =
    * 2T/(d(d−1)) rounded 6 dp, NULL for degree < 2.
    */
  def triangleReport(edges: DataFrame,
      aCol: String = "node_a", bCol: String = "node_b"): DataFrame = {
    // e cached: it feeds the degree census, the orientation join and
    // (via deg) the final report — uncached, each consumer re-derived
    // the whole upstream edge relation (round-14: up to 7 re-runs per
    // call measured on the co-purchase graph). deg cached for its two
    // decoration joins + the final report join.
    val e = graft.util.Caches.cached(
      edges.select(col(aCol).as("a"), col(bCol).as("b")))
    val deg = graft.util.Caches.cached(
      e.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("degree")))
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("db")), Seq("b"))
    val forward = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = graft.util.Caches.cached(
      withDeg.select(
        when(forward, col("a")).otherwise(col("b")).as("src"),
        when(forward, col("b")).otherwise(col("a")).as("dst")))
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.dst") === col("y.src"))
      .select(col("x.src").as("ta"), col("x.dst").as("tb"), col("y.dst").as("tc"))
    val tris = wedges.join(oriented.as("z"),
      col("ta") === col("z.src") && col("tc") === col("z.dst"))
    val perNode = tris
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          round(lit(2.0) * col("n_triangles") /
            (col("degree").cast("double") * (col("degree") - 1)), 6)))
      .select("node", "degree", "n_triangles", "clustering")
      .orderBy("node")
  }

  /** Frontier BFS: minimum hop distance (≤ k) from a seed set over an
    * undirected edge relation — the reachability primitive behind
    * "how far does contamination/licensing taint spread through the
    * dup-cluster graph" audits (k-hop closure of a flagged set).
    *
    * Each round expands only the FRONTIER (nodes first reached in the
    * previous round), not the whole known set: one src-keyed join of the
    * frontier against the directed edges, a distinct, and an anti-join
    * against the known relation. Every edge is therefore traversed once
    * per endpoint over the WHOLE run — O(E) total like textbook BFS, not
    * O(k·E) as full min-propagation per round would be. Known/frontier
    * relations localCheckpoint per round (the connectedComponents
    * pattern): lineage stays flat, nothing is collected.
    *
    * Equivalent to k rounds of min-distance propagation (what the
    * unrolled SQL oracle runs): a node's first-reach round IS its
    * minimum hop distance. Output: (node, degree, dist) for every graph
    * node, dist NULL when unreached within k hops.
    */
  def khopMinDist(edges: DataFrame, seeds: DataFrame, k: Int,
      aCol: String = "node_a", bCol: String = "node_b"): DataFrame = {
    // src-hash-partitioned cache: each round's frontier join reuses the
    // layout (the pageRankMicro trick) — edges shuffle once, not per hop
    val directed = graft.util.Caches.cached(
      bothDirections(edges, aCol, bCol).repartition(col("src")))
    val deg = directed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
    var known = seeds.select(col("node"), lit(0).as("dist")).localCheckpoint()
    var frontier = known
    var round = 1
    while (round <= k) {
      val cand = directed
        .join(frontier.select(col("node").as("src")), Seq("src"))
        .select(col("dst").as("node")).distinct()
      frontier = cand.join(known, Seq("node"), "left_anti")
        .withColumn("dist", lit(round))
        .localCheckpoint()
      known = known.unionByName(frontier).localCheckpoint()
      round += 1
    }
    deg.join(known, Seq("node"), "left")
      .select("node", "degree", "dist")
      .orderBy("node")
  }

  /** Item–item co-occurrence cosine top-k — the classic "customers who
    * bought X also bought Y" recommender primitive over the SAME capped
    * basket relation as [[coOccurrenceEdges]]/AssociationRules:
    * `cos(a, b) = n_both/√(n_a·n_b)` normalizes raw co-counts by item
    * popularity, so ubiquitous items stop dominating every list.
    *
    * The cosine is the one double, ROUNDED to 6 dp BEFORE entering the
    * per-item TopKBy heap — the heap therefore orders by exactly the
    * value the SQL oracle ranks by ((cos desc, other asc), total with
    * the id tiebreak). Bounded-heap partial aggregation keeps the
    * exchange at O(items·k); the pair stage is the capped basket
    * self-join.
    *
    * Output: (item, other, n_item, n_other, n_both, cos_sim, rank),
    * (item, rank)-ordered.
    */
  def itemSimilarityTopK(baskets: DataFrame, groupCol: String,
      itemCol: String, k: Int,
      maxGroupSize: Option[Long] = None): DataFrame = {
    // The heap tiebreak encodes ascending item id as -id, which only
    // works for numeric ids — a string id would cast to NULL under
    // non-ANSI mode and silently collapse the tiebreak (then round-trip
    // back as NULL item ids). Enforce the contract eagerly.
    require(baskets.schema(itemCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"itemSimilarityTopK requires a numeric item column; " +
        s"'$itemCol' is ${baskets.schema(itemCol).dataType.simpleString}" +
        " — hash or dictionary-encode string ids first (e.g. xxhash64)")
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
    val itemCounts = graft.util.Caches.cached(
      base.groupBy("it").agg(count(lit(1)).as("n_it")))
    val pairs = base.as("a")
      .join(base.as("b"),
        col("a.g") === col("b.g") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("it_a"), col("b.it").as("it_b"))
      .agg(count(lit(1)).as("n_both"))
    // both directions via explode: the union shape would execute the
    // pair aggregation once per branch (round-14, the bothDirections
    // rationale — pairs is deliberately uncached, it is pair-grain)
    val directed = pairs
      .select(explode(array(
        struct(col("it_a").as("item"), col("it_b").as("other"), col("n_both")),
        struct(col("it_b").as("item"), col("it_a").as("other"), col("n_both"))))
        .as("e"))
      .select(col("e.*"))
      .join(itemCounts.select(col("it").as("item"),
        col("n_it").as("n_item")), Seq("item"))
      .join(itemCounts.select(col("it").as("other"),
        col("n_it").as("n_other")), Seq("other"))
      .withColumn("cos_sim", round(col("n_both") /
        sqrt(col("n_item").cast("double") * col("n_other")), 6))
    directed
      .groupBy("item", "n_item")
      .agg(graft.functions.TopKBy.topKBy(
        struct(col("cos_sim"), (-col("other")).as("no"),
          col("n_other"), col("n_both")), k).as("top"))
      .select(col("item"), col("n_item"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("item"), (-col("t.no")).as("other"), col("n_item"),
        col("t.n_other").as("n_other"), col("t.n_both").as("n_both"),
        col("t.cos_sim").as("cos_sim"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("item", "rank")
  }

  /** Topic-sensitive (personalized) PageRank: the restart mass lands on
    * a SEED relation instead of uniformly — rank then measures
    * closeness-to-the-seeds under the random-surfer walk, the
    * "authority relative to a flagged set" tool (contamination
    * neighborhoods, trusted-source proximity) complementing
    * [[khopMinDist]]'s hard hop cutoff with a soft, weighted one.
    *
    * Integer convention as [[pageRankMicro]]: total restart mass is
    * preserved at 150000·N micro and split over seeds proportionally
    * to their weight — `restart_i = (150000·N·w_i) div Σw`, exact
    * floor division (non-seed nodes restart at 0). Updates are
    * `restart_i + (85·Σ incoming) div 100`; every quantity is a
    * non-negative integer, so a fixed iteration count unrolls
    * bit-exactly in SQL. Same cached src-hash-partitioned edge layout
    * and per-round localCheckpoint as the uniform variant.
    *
    * Seed contract: the set must be non-empty with strictly positive
    * weights (validated eagerly — a K-row collect, same budget as a
    * centroid round); a seed absent from the edge relation still
    * counts in Σw but receives no rank row (it has no edges to walk),
    * so its share of the restart mass is deliberately unassigned.
    *
    * Output: (node, degree, restart_micro, rank_micro), node-ordered.
    */
  def pageRankPersonalizedMicro(edges: DataFrame, iterations: Int,
      seeds: DataFrame, aCol: String = "node_a",
      bCol: String = "node_b", seedNodeCol: String = "node",
      seedWeightCol: String = "w"): DataFrame = {
    // one cached both-directions relation feeds deg AND ed (round-14:
    // same derive-once rework as pageRankMicro)
    val directed = graft.util.Caches.cached(
      bothDirections(edges, aCol, bCol))
    val deg = graft.util.Caches.cached(
      directed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree")))
    val ed = graft.util.Caches.cached(
      directed.join(deg.withColumnRenamed("node", "src"), Seq("src"))
        .repartition(col("src")))
    // The seed set is K-row driver state (same budget as a centroid
    // collect): validate it up front — an empty or zero/negative-weight
    // seed set would otherwise propagate NULL ranks with no error.
    // Seeds absent from the edge relation carry no restart mass (their
    // weight still counts in Σw); that is the documented contract.
    val seedStats = seeds.agg(
      sum(col(seedWeightCol).cast("long")).as("sw"),
      min(col(seedWeightCol).cast("long")).as("minw"),
      count(lit(1)).as("k")).collect()(0)
    require(seedStats.getLong(2) > 0, "seed set must be non-empty")
    require(!seedStats.isNullAt(1) && seedStats.getLong(1) > 0,
      "seed weights must be positive")
    val totals = deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(seeds.agg(sum(col(seedWeightCol)).as("sw")))
    val restarts = graft.util.Caches.cached(deg.select("node")
      .join(seeds.select(col(seedNodeCol).as("node"),
        col(seedWeightCol).cast("long").as("w")), Seq("node"), "left")
      .na.fill(0L, Seq("w"))
      .crossJoin(broadcast(totals))
      // accumulate the 150000·N·w product in DECIMAL(38,0): at 1e8
      // nodes × 1e6 weights it exceeds Long and would silently wrap
      // under non-ANSI mode; values fit 38 digits with room to spare
      .select(col("node"),
        expr("cast((cast(150000 as decimal(38,0)) * n_nodes * w) " +
          "div sw as bigint)").as("restart_micro")))
    var ranks = deg.select(col("node"), lit(1000000L).as("rank_micro"))
      .localCheckpoint()
    var round = 0
    while (round < iterations) {
      val incoming = ed
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("rank_micro div degree").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("s"))
      ranks = restarts
        .join(incoming, Seq("node"), "left")
        .select(col("node"),
          (col("restart_micro") +
            expr("(85 * coalesce(s, 0L)) div 100")).as("rank_micro"))
        .localCheckpoint()
      // directed's last consumer (ed's fill) ran in round 1 — release
      // the duplicate edge cache early (ADVICE r14, as in pageRankMicro)
      if (round == 0) directed.unpersist(blocking = false)
      round += 1
    }
    deg.join(restarts, Seq("node")).join(ranks, Seq("node"))
      .select("node", "degree", "restart_micro", "rank_micro")
      .orderBy("node")
  }

  /** Degree assortativity coefficient — the one-number "do hubs link to
    * hubs?" structure summary completing the degree/triangle/component/
    * rank family: Pearson correlation of the degrees at either end of
    * every edge (both directions, so the statistic is symmetric). Near
    * +1 = assortative (social-graph-like), near −1 = disassortative
    * (hub-and-spoke), ~0 = neutral.
    *
    * Integer cores: m and the degree sums stay in Long; the product
    * sums accumulate in DECIMAL(38,0) (deg²·E headroom — the oracle's
    * HUGEINT matches exactly); r derives from the exact cores with the
    * identical expression both engines. Shape: degree census keyed by
    * node, two node-keyed joins to decorate each directed edge, ONE
    * stat aggregate. NULL on degree-regular graphs (variance 0).
    *
    * Output (one row): (m_directed, sum_dx, sum_dy, assortativity).
    */
  def assortativityReport(edges: DataFrame, aCol: String = "node_a",
      bCol: String = "node_b"): DataFrame = {
    val dec = "decimal(38,0)"
    // the directed cache lives until the caller's Caches.releaseAll —
    // unlike the pageRank walks there is only ONE action here (the stat
    // aggregate), so it cannot be dropped earlier; footprint is one
    // both-directions edge copy (ADVICE r14 note)
    val directed = graft.util.Caches.cached(
      bothDirections(edges, aCol, bCol))
    val deg = directed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val pairs = directed
      .join(deg.select(col("node").as("src"), col("deg").as("dx")),
        Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("dy")),
        Seq("dst"))
    val s = pairs.agg(count(lit(1)).as("m"),
      sum("dx").as("sx"), sum("dy").as("sy"),
      sum(col("dx").cast(dec) * col("dy").cast(dec)).as("sxy"),
      sum(col("dx").cast(dec) * col("dx").cast(dec)).as("sxx"),
      sum(col("dy").cast(dec) * col("dy").cast(dec)).as("syy"))
    val varX = col("m").cast(dec) * col("sxx") -
      col("sx").cast(dec) * col("sx").cast(dec)
    val varY = col("m").cast(dec) * col("syy") -
      col("sy").cast(dec) * col("sy").cast(dec)
    s.select(col("m").as("m_directed"),
      col("sx").as("sum_dx"), col("sy").as("sum_dy"),
      when(varX > 0 && varY > 0, round(
        (col("m").cast(dec) * col("sxy") -
          col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
          sqrt(varX.cast("double") * varY.cast("double")), 6))
        .as("assortativity"))
  }
}
