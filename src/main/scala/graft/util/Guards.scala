package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Driver-side collect guards. Several stat-grain operators finish a
  * ≤K-row relation on the driver in exact BigInt arithmetic (the house
  * K-row-stat allowance — see bradleyTerry / kruskalWallis /
  * removalEffect). The allowance is only safe if K actually stays
  * small, so every such collect goes through [[countedCollect]]: it
  * pulls at most cap+1 rows in ONE action and fails loudly — with the
  * operator's name — before an over-cardinality census can OOM the
  * driver. A silent full collect is never the failure mode.
  */
object Guards {

  /** Hard cap on rows any driver-side stat finish may collect. */
  val MaxCensusRows: Long = 100000L

  /** Collect at most cap rows; require the relation fits. The extra
    * +1 row is fetched only to detect overflow — no count() pre-pass,
    * no second job.
    */
  def countedCollect(df: DataFrame, op: String,
      cap: Long = MaxCensusRows): Array[Row] = {
    // the cap feeds limit() as an Int: a cap at or above Int.MaxValue
    // would silently wrap negative and the guard would misbehave
    // instead of guarding — reject it loudly
    require(cap > 0 && cap < Int.MaxValue,
      s"$op: collect cap must be in (0, Int.MaxValue), got $cap")
    val rows = df.limit((cap + 1).toInt).collect()
    require(rows.length <= cap,
      s"$op: stat relation exceeds the driver-side cap of $cap rows " +
        "— aggregate to a coarser grain before the driver-side finish")
    rows
  }

  /** Ceiling for census relations entering an unpartitioned window or
    * a broadcast containment join. A VALUE-BOUNDED census (digit
    * grids, day grids, n_chars histograms) sits orders of magnitude
    * under this; crossing it means the value-domain claim has drifted
    * to corpus grain and the plan is about to single-task-sort (or
    * broadcast) an entity-cardinality relation.
    */
  val MaxWindowCensusRows: Long = 1000000L

  /** IN-PLAN cardinality ceiling — [[countedCollect]] transposed to
    * window/broadcast inputs: returns `df` with identical rows, but
    * the plan raises loudly at execution time if `df` holds more than
    * `cap` rows. The count rides a separate 1-row aggregate crossJoined
    * in (so the failure fires BEFORE a window buffers the oversized
    * partition); callers should pass a CACHED census so the count pass
    * is one cheap cache read, not a second upstream scan.
    *
    * The guard column threads through a real filter dependency —
    * `when(n > cap, raise_error).otherwise(0) === 0` — rather than
    * `assert_true(...).isNull`, whose always-null type invites the
    * optimizer to fold the predicate away.
    */
  def boundedCensus(df: DataFrame, op: String,
      cap: Long = MaxWindowCensusRows): DataFrame = {
    require(cap > 0, s"$op: census cap must be positive, got $cap")
    val n = df.agg(count(lit(1)).cast("long").as("__census_n"))
    df.crossJoin(broadcast(n))
      .withColumn("__census_guard",
        when(col("__census_n") > cap, raise_error(concat(
          lit(s"$op: census relation exceeded the cardinality " +
            s"ceiling $cap (got "), col("__census_n"),
          lit(" rows) — the value-domain claim has drifted to " +
            "corpus grain; rebuild on PrefixSum.cumBefore or " +
            "aggregate to a coarser grain"))))
          .otherwise(lit(0L)))
      .filter(col("__census_guard") === 0L)
      .drop("__census_n", "__census_guard")
  }
}
